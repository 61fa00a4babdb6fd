#!/usr/bin/env python
"""spark-submit entry point for the encode pipeline (north rule:
"run via spark-submit --py-files on multi-executor clusters").

Cluster usage (production, Iceberg source)::

    zip -r engine.zip cpp_parquet_spark
    spark-submit \\
        --master yarn --deploy-mode cluster \\
        --num-executors $N --executor-cores 8 --executor-memory 16g \\
        --packages org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:1.8.0 \\
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
        --conf spark.sql.catalog.lake.type=rest \\
        --py-files engine.zip \\
        tools/submit_encode.py \\
        --src lake.db.repo_files --dst s3://bucket/encoded --parts 4096

Sandbox usage (parquet source, no Iceberg jar present — verified absent
from pyspark/jars; same DataFrame code either way)::

    python tools/submit_encode.py --src /root/testdata/sf0.01 --table documents \\
        --dst /tmp/enc_out --parts 32

The job is resumable: rerunning with the same --dst anti-joins the
manifest and encodes only missing partitions (engine.run_encode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# also importable without --py-files when run from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True,
                    help="Iceberg table name or parquet dir")
    ap.add_argument("--table", default=None,
                    help="table file name when --src is a fixtures dir")
    ap.add_argument("--dst", required=True, help="output dir (pages+manifest)")
    ap.add_argument("--parts", type=int, default=None,
                    help="explicit part count; default: planned from bytes")
    ap.add_argument("--keys", default="repo", help="comma-separated skew keys")
    ap.add_argument("--salt-from", default="path")
    ap.add_argument("--salt-buckets", type=int, default=32)
    ap.add_argument("--order-keys", default="path")
    ap.add_argument("--decode-verify", action="store_true",
                    help="decode + sha256-verify after encode (2x cost)")
    ap.add_argument("--stats-pass", action="store_true",
                    help="run the sampling stats pass and drive codec "
                         "selection from its per-(part, column) decisions")
    ap.add_argument("--stats-fraction", type=float, default=0.05)
    ap.add_argument("--block-codec", default=None,
                    help="E9 outer block compression: zstd/zlib/lz4/"
                         "snappy/gzip, or 'auto' to let the stats pass "
                         "decide from byte entropy (requires "
                         "--stats-pass); floats flow to byte-stream-"
                         "split layouts (bss/listb) when set")
    ap.add_argument("--compact", action="store_true",
                    help="after encode, merge live parts smaller than "
                         "--compact-min-bytes into ~--compact-target-bytes "
                         "bins (page move, no re-encode; atomic manifest "
                         "commit). The natural companion to streaming "
                         "ingest, which accretes small per-batch parts.")
    ap.add_argument("--compact-min-bytes", type=int, default=8 << 20)
    ap.add_argument("--compact-target-bytes", type=int, default=64 << 20)
    args = ap.parse_args(argv)

    # imports deferred so --help works without a JVM
    from pyspark.sql import SparkSession, functions as F

    from cpp_parquet_spark.engine import (decode_dataset, run_encode,
                                          verify_roundtrip)
    from cpp_parquet_spark.partitioning import EncodeConfig, plan_num_parts

    spark = SparkSession.builder.appName("cpp_parquet_spark.encode") \
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.table:
        df = spark.read.parquet(f"{args.src.rstrip('/')}/{args.table}.parquet")
        name = args.table
    elif "/" in args.src:
        df = spark.read.parquet(args.src)
        name = args.src.rstrip("/").rsplit("/", 1)[-1]
    else:
        df = spark.read.table(args.src)     # Iceberg catalog table
        name = args.src.rsplit(".", 1)[-1]

    parts = args.parts
    if parts is None:
        # sample-based bytes estimate -> bytes-per-part plan (SURVEY.md §4.3)
        sample = df.sample(0.01, seed=42).agg(
            F.sum(F.octet_length(F.col(df.columns[-1]).cast("string")))
        ).collect()[0][0] or 0
        parts = plan_num_parts(int(sample * 100))

    block = args.block_codec
    if block == "auto" and not args.stats_pass:
        ap.error("--block-codec auto requires --stats-pass")

    cfg = EncodeConfig(
        keys=tuple(k for k in args.keys.split(",") if k),
        salt_from=tuple(k for k in args.salt_from.split(",") if k),
        salt_buckets=args.salt_buckets,
        num_parts=parts,
        order_keys=tuple(k for k in args.order_keys.split(",") if k),
        block_codec=None if block == "auto" else block,
        table_name=name)

    plan = None
    if args.stats_pass:
        from dataclasses import replace

        from cpp_parquet_spark.stats import (column_stats, decide_codecs,
                                             suggest_block_codec)
        st = column_stats(df, cfg, args.stats_fraction).cache()
        try:
            if block == "auto":
                # decide E9 from the sampled byte entropy BEFORE the codec
                # plan: the plan's float/array routing (bss/listb) depends
                # on whether a block codec will compress the byte planes
                cfg = replace(cfg, block_codec=suggest_block_codec(st))
            dec = decide_codecs(st, block_codec=cfg.block_codec)
            plan = {(r["part_id"], r["column"]): r["codec"]
                    for r in dec.collect()}
        finally:
            st.unpersist()

    t0 = time.monotonic()
    summary = run_encode(spark, df, args.dst, cfg, plan=plan)
    summary["encode_wall_s"] = round(time.monotonic() - t0, 2)
    if plan is not None:
        summary["stats_pass_decisions"] = len(plan)
    if cfg.block_codec:
        summary["block_codec"] = cfg.block_codec

    if args.compact:
        from cpp_parquet_spark.engine import compact_parts
        summary["compaction"] = compact_parts(
            spark, args.dst, min_bytes=args.compact_min_bytes,
            target_bytes=args.compact_target_bytes)

    if args.decode_verify:
        decoded = decode_dataset(spark, args.dst)
        content_col = df.columns[-1]
        summary["verify"] = verify_roundtrip(df, decoded, content_col)

    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
