"""Structured Streaming ingestion (cpp_parquet_spark.streaming)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from cpp_parquet_spark.engine import decode_dataset, verify_roundtrip
from cpp_parquet_spark.partitioning import EncodeConfig
from cpp_parquet_spark.streaming import stream_encode
from cpp_parquet_spark.synth import repofiles

CFG = EncodeConfig(keys=("repo",), salt_from=("path",), num_parts=4,
                   order_keys=("path",), table_name="repofiles")


def _drop_files(src: str, drops: list[tuple[str, int]], rows_per_file: int):
    os.makedirs(src, exist_ok=True)
    for name, seed in drops:
        tbl = repofiles(rows_per_file, seed=seed)
        pq.write_table(tbl, os.path.join(src, f"{name}.parquet"))


def test_stream_encode_two_waves(spark, tmp_path):
    src = str(tmp_path / "incoming")
    dst = str(tmp_path / "enc")
    _drop_files(src, [("a", 100), ("b", 101)], 300)
    schema = ("repo string, path string, commit string, "
              "lang string, content string")

    q = stream_encode(spark, src, schema, dst, CFG)
    q.awaitTermination(120)

    # second wave: new files; "c" repeats seed 100 -> byte-identical rows
    # under a new filename, which streaming must append (the parts
    # already exist), not part-level-resume away
    _drop_files(src, [("c", 100), ("d", 102)], 300)
    q2 = stream_encode(spark, src, schema, dst, CFG)
    q2.awaitTermination(120)

    decoded = decode_dataset(spark, dst)
    assert decoded.count() == 4 * 300

    src_df = spark.read.parquet(f"{src}/*.parquet")
    res = verify_roundtrip(src_df, decoded, "content")
    assert res["sha256_match_rate"] == 1.0

    # manifest lineage: one run_id per micro-batch, all distinct
    manifest = spark.read.parquet(f"{dst}/manifest")
    run_ids = {r["run_id"] for r in manifest.select("run_id").distinct().collect()}
    assert all(r.startswith("batch-") for r in run_ids)
    assert len(run_ids) >= 2


def test_stream_replay_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "incoming")
    dst = str(tmp_path / "enc")
    _drop_files(src, [("x", 500)], 200)
    schema = ("repo string, path string, commit string, "
              "lang string, content string")

    ckpt = str(tmp_path / "ckpt")
    q = stream_encode(spark, src, schema, dst, CFG, checkpoint=ckpt)
    q.awaitTermination(120)
    n1 = decode_dataset(spark, dst).count()

    # new checkpoint dir => the same files replay as epoch 0 again; the
    # manifest run_id guard must make this a no-op
    q2 = stream_encode(spark, src, schema, dst, CFG,
                       checkpoint=str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    n2 = decode_dataset(spark, dst).count()
    assert n1 == n2 == 200
