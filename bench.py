#!/usr/bin/env python
"""Bench harness (SURVEY.md §7 M7; driver contract).

Runs the engine's headline pipelines on ``local[$SPARK_GRAFT_CPUS]``
(default 32) and prints ONE JSON line::

    {"metric": "bench_total_wall", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "encode_gbps": <content GB/s of the north-rule encode>,
     "content_bytes": <bytes encoded in the headline query>}

Inputs:
- the north-rule table ``(repo, path, commit, lang, content)`` synthesized
  deterministically (seed 42) by ``cpp_parquet_spark.synth`` — no external
  data (BASELINE.json:14);
- the driver fixtures at ``$SPARK_GRAFT_SF_DIR`` (default
  ``/root/testdata/sf0.1``).

Scaling evidence (two-cluster-size rule): after the query sweep the
harness re-invokes itself at local[8] and local[32] on the SAME 800k-row
input (encode only, best-of-REPS per level, waiting out co-tenant load
flares) and embeds the pair + efficiency in the JSON as ``"scaling"``;
``encode_gbps`` / ``encode_plain_gbps`` are taken from the local[32] legs
so they measure kernel throughput at 2 GB, not the 5 s job-setup floor
that dominates the 248 MB sweep. ``tools/scaling.py`` remains the
long-form multi-pair tool.

Env knobs:
  SPARK_GRAFT_SF_DIR   driver fixture dir          (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism         (default 32)
  BENCH_REPOFILES_ROWS north-rule table row count  (default 100000)
  BENCH_ONLY           comma-separated query subset (also disables probe)
  BENCH_SCALING        0 disables the scaling probe (default 1)
  BENCH_SCALING_ROWS   probe input rows            (default 800000)
  BENCH_SCALING_REPS   probe reps per level        (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cpp_parquet_spark.engine import decode_table, encode_table, verify_roundtrip
from cpp_parquet_spark.partitioning import EncodeConfig
from cpp_parquet_spark.session import get_spark
from cpp_parquet_spark.synth import SF_ROWS, fixture_path, repofiles

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO_ROWS = int(os.environ.get("BENCH_REPOFILES_ROWS", "100000"))

# north-rule config: salted repartition on (repo, path-bucket); enough parts
# to keep every core busy at either parallelism level (8 or 32)
REPO_CFG = EncodeConfig(keys=("repo",), salt_from=("path",), salt_buckets=32,
                        num_parts=256, order_keys=("path",),
                        table_name="repofiles")
DOCS_CFG = EncodeConfig(keys=("source",), salt_from=("doc_id",), num_parts=16,
                        order_keys=("doc_id",), table_name="documents")
LINEITEM_CFG = EncodeConfig(keys=("l_returnflag",), salt_from=("l_orderkey",),
                            num_parts=32,
                            order_keys=("l_orderkey", "l_linenumber"),
                            table_name="lineitem")


def _force(df: DataFrame) -> int:
    """Force full materialization without driver collect."""
    return df.write.mode("overwrite").format("noop").save() or 0


def _repofiles_df(spark: SparkSession) -> DataFrame:
    path = _repofiles_parquet()
    return spark.read.parquet(path)


_REPO_PATH: str | None = None


def _repofiles_parquet() -> str:
    global _REPO_PATH
    if _REPO_PATH is None:
        if REPO_ROWS in SF_ROWS.values():
            sf = next(k for k, v in SF_ROWS.items() if v == REPO_ROWS)
            _REPO_PATH = fixture_path(sf)
        else:
            import pyarrow.parquet as pq
            from cpp_parquet_spark.synth import CACHE
            cache = os.path.abspath(CACHE)
            os.makedirs(cache, exist_ok=True)
            p = os.path.join(cache, f"repofiles_n{REPO_ROWS}.parquet")
            if not os.path.exists(p):
                # small row groups => parallel scan (see synth.fixture_path)
                pq.write_table(repofiles(REPO_ROWS, seed=42), p,
                               row_group_size=8192)
            _REPO_PATH = p
    return _REPO_PATH


def q_encode_repofiles(spark: SparkSession) -> None:
    """HEADLINE: north-rule encode — auto-selected codecs over source code."""
    df = _repofiles_df(spark)
    _force(encode_table(df, REPO_CFG))


def q_encode_repofiles_plain(spark: SparkSession) -> None:
    """Apples-to-apples vs the stand-in reference writer: PLAIN-only
    encode (the toy cpp-parquet writes PLAIN, UNCOMPRESSED) — measures
    the pipeline ceiling without FSST's compression work."""
    df = _repofiles_df(spark)
    cfg = EncodeConfig(keys=("repo",), salt_from=("path",), salt_buckets=32,
                       num_parts=REPO_CFG.num_parts, order_keys=("path",),
                       codec_overrides={c: "plain" for c in
                                        ("repo", "path", "commit", "lang",
                                         "content")},
                       table_name="repofiles_plain")
    _force(encode_table(df, cfg))


def q_roundtrip_repofiles(spark: SparkSession) -> None:
    """Encode -> decode -> per-value sha256 verify on content.

    Pages are cached between encode and decode, matching the real pipeline
    where pages land on disk before any decode reads them."""
    df = _repofiles_df(spark)
    pages = encode_table(df, REPO_CFG)
    cols = pages._cps_columns
    pages = pages.cache()
    try:
        decoded = decode_table(pages, columns=cols)
        res = verify_roundtrip(df, decoded, "content")
        assert res["sha256_match_rate"] == 1.0, res
    finally:
        pages.unpersist()


def q_stats_select(spark: SparkSession) -> None:
    """Sampling pass + codec decision stats (E8/S6) over the north-rule table."""
    df = _repofiles_df(spark).sample(0.1, seed=42)
    stats = (df.groupBy("lang")
             .agg(F.count("*").alias("n"),
                  F.approx_count_distinct("content").alias("nd_content"),
                  F.sum(F.octet_length("content")).alias("bytes"),
                  F.avg(F.octet_length("content")).alias("avg_len")))
    _force(stats)


def q_encode_documents(spark: SparkSession) -> None:
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _force(encode_table(df, DOCS_CFG))


def q_encode_lineitem(spark: SparkSession) -> None:
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    _force(encode_table(df, LINEITEM_CFG))


def q_join_agg(spark: SparkSession) -> None:
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    _force(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("total")))


def q_dedup_minhash(spark: SparkSession) -> None:
    """MinHash+LSH near-dup over the documents fixture. (The synthetic
    north-rule content is pool-generated, so same-language files collide
    in nearly every LSH band and the candidate set goes quadratic — real
    corpora and the driver fixture have selective bands.)"""
    from cpp_parquet_spark.dedup import minhash_dedup_pairs
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _force(minhash_dedup_pairs(df, threshold=0.7))


def q_text_pipeline(spark: SparkSession) -> None:
    """Quality + fingerprint over the north-rule content (pure built-ins)."""
    from cpp_parquet_spark.textops import fingerprint, quality
    df = _repofiles_df(spark).select(
        F.xxhash64("repo", "path").alias("doc_id"),
        F.col("content").alias("text"), F.col("lang"))
    _force(quality(df))
    _force(fingerprint(df, prefix=256))


def q_ann_topk(spark: SparkSession) -> None:
    from cpp_parquet_spark.similarity import brute_topk, lsh_topk
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _force(brute_topk(emb, [0, 1, 2, 3, 4], k=10))
    _force(lsh_topk(emb, [0, 1, 2, 3, 4], k=10))


QUERIES = {
    "encode_repofiles": q_encode_repofiles,
    "encode_repofiles_plain": q_encode_repofiles_plain,
    "roundtrip_repofiles": q_roundtrip_repofiles,
    "stats_select": q_stats_select,
    "encode_documents": q_encode_documents,
    "encode_lineitem": q_encode_lineitem,
    "join_agg": q_join_agg,
    "dedup_minhash": q_dedup_minhash,
    "text_pipeline": q_text_pipeline,
    "ann_topk": q_ann_topk,
}


def _loadavg() -> float:
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except OSError:
        return 0.0


def _wait_quiet(limit: float = 4.0, timeout: float = 180.0) -> None:
    """Best-effort dodge of co-tenant load flares before a probe run."""
    t0 = time.monotonic()
    while _loadavg() > limit and time.monotonic() - t0 < timeout:
        time.sleep(10)


def _scaling_probe() -> dict | None:
    """local[8] vs local[32] on the same 800k-row input (the sandbox
    substitute for N vs 4N executors, BASELINE.json north rule). Each leg
    re-invokes this file with BENCH_ONLY=encode_repofiles,
    encode_repofiles_plain so the measurement is a fresh JVM with the
    identical code path the sweep uses; best-of-REPS per level because
    the box shares hardware with co-tenants (see BENCH.md)."""
    import subprocess
    rows = int(os.environ.get("BENCH_SCALING_ROWS", "800000"))
    reps = int(os.environ.get("BENCH_SCALING_REPS", "2"))
    here = os.path.abspath(__file__)
    runs: dict[int, list[dict]] = {8: [], 32: []}
    for rep in range(reps):
        for cpus in (8, 32):
            _wait_quiet()
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                       BENCH_REPOFILES_ROWS=str(rows), BENCH_SCALING="0",
                       BENCH_ONLY="encode_repofiles,encode_repofiles_plain")
            try:
                out = subprocess.run(
                    [sys.executable, here], env=env, capture_output=True,
                    text=True, timeout=1200, check=True,
                    cwd=os.path.dirname(here))
                runs[cpus].append(
                    json.loads(out.stdout.strip().splitlines()[-1]))
            except (subprocess.SubprocessError, ValueError, IndexError):
                continue
    if not runs[8] or not runs[32]:
        return None
    best = {c: min(rs, key=lambda r: r["queries"]["encode_repofiles"])
            for c, rs in runs.items()}
    cb = best[32]["content_bytes"]
    t8 = best[8]["queries"]["encode_repofiles"]
    t32 = best[32]["queries"]["encode_repofiles"]
    p8 = best[8]["queries"]["encode_repofiles_plain"]
    p32 = best[32]["queries"]["encode_repofiles_plain"]
    return {
        "rows": rows, "content_bytes": cb, "n_cpus": 8, "n4_cpus": 32,
        "t_n": t8, "t_n4": t32,
        "gbps_n": round(cb / t8 / 1e9, 4),
        "gbps_n4": round(cb / t32 / 1e9, 4),
        "efficiency": round((t8 / t32) / 4.0, 3),
        "plain": {"t_n": p8, "t_n4": p32,
                  "gbps_n": round(cb / p8 / 1e9, 4),
                  "gbps_n4": round(cb / p32 / 1e9, 4),
                  "efficiency": round((p8 / p32) / 4.0, 3)},
        "walls_n": [r["queries"]["encode_repofiles"] for r in runs[8]],
        "walls_n4": [r["queries"]["encode_repofiles"] for r in runs[32]],
    }


def main() -> None:
    only = [s for s in os.environ.get("BENCH_ONLY", "").split(",") if s]
    names = only or list(QUERIES)
    # hybrid JVM+Python encode stages: 2-core task slots stop the 2x
    # thread oversubscription (serde thread + Python worker per task)
    spark = get_spark(f"local[{CPUS}]", task_cpus=2 if CPUS >= 16 else 1)
    # warm up JVM + Python workers so timings measure the kernels, not
    # startup; enough parts that every worker slot spawns and imports
    warm = spark.createDataFrame([(str(i), "warm" * 10) for i in range(4096)],
                                 "repo string, content string") \
        .withColumn("path", F.lit("p")).withColumn("commit", F.lit("c")) \
        .withColumn("lang", F.lit("txt"))
    _force(encode_table(warm, EncodeConfig(keys=("repo",), salt_from=(),
                                           num_parts=4 * CPUS,
                                           table_name="warm")))

    content_bytes = _repofiles_df(spark).agg(
        F.sum(F.octet_length("content"))).collect()[0][0]

    times: dict[str, float] = {}
    t_all = time.monotonic()
    for name in names:
        t0 = time.monotonic()
        QUERIES[name](spark)
        times[name] = round(time.monotonic() - t0, 3)
    total = round(time.monotonic() - t_all, 3)

    gbps = None
    if "encode_repofiles" in times and times["encode_repofiles"] > 0:
        gbps = round(content_bytes / times["encode_repofiles"] / 1e9, 4)
    spark.stop()

    out = {
        "metric": "bench_total_wall", "value": total, "unit": "sec",
        "queries": times, "sf": None,
        "encode_gbps": gbps, "content_bytes": int(content_bytes),
        "cpus": CPUS, "repofiles_rows": REPO_ROWS,
    }
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        out["sf"] = float(sf)
    except ValueError:
        out["sf"] = sf

    if not only and os.environ.get("BENCH_SCALING", "1") != "0":
        scaling = _scaling_probe()
        if scaling is not None:
            out["scaling"] = scaling
            # headline throughput from the 2 GB local[32] legs (kernel-
            # bound), not the overhead-dominated 248 MB sweep
            out["encode_gbps"] = scaling["gbps_n4"]
            out["encode_plain_gbps"] = scaling["plain"]["gbps_n4"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
