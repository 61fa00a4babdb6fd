"""Dataset observability (catalog.py): commit history, layout
description, health summary — metadata-only scans."""

import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark.catalog import (dataset_summary, describe_dataset,
                                       history)
from cpp_parquet_spark.engine import (EncodeConfig, compact_parts,
                                      delete_where_in, run_encode)


@pytest.fixture()
def dst(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = str(tmp_path / "cat")
    cfg = EncodeConfig(keys=("doc_id",), salt_from=("doc_id",), num_parts=2,
                       order_keys=("doc_id",), bloom_cols=("doc_id",),
                       table_name="cat")
    run_encode(spark, docs.filter(F.col("doc_id") < 250)
               .select("doc_id", "text", "lang"), d, cfg, run_id="r1",
               resume=False)
    run_encode(spark, docs.filter(F.col("doc_id") >= 250)
               .select("doc_id", "text", "lang"), d, cfg, run_id="r2",
               resume=False)
    delete_where_in(spark, d, "doc_id", [3, 400])
    compact_parts(spark, d, min_bytes=1 << 30)
    return d


def test_history_lists_every_operation(spark, dst):
    h = history(spark, dst).collect()
    ops = [r["op"] for r in h]
    assert ops.count("append") == 2
    assert ops.count("delete") == 1
    assert ops.count("rewrite") >= 1          # the compaction
    rw = [r for r in h if r["op"] == "rewrite"][0]
    assert rw["supersedes"] >= 2
    # newest first
    times = [r["committed_at"] for r in h if r["committed_at"]]
    assert times == sorted(times, reverse=True)


def test_describe_shows_codec_mix_and_ratio(spark, dst):
    d = {(r["column"], r["codec"]): r for r in
         describe_dataset(spark, dst).collect()}
    cols = {c for c, _ in d}
    assert cols == {"doc_id", "text", "lang"}
    for r in d.values():
        assert r["raw_bytes"] >= 0 and r["enc_bytes"] > 0
    assert sum(r["values"] for (c, _), r in d.items()
               if c == "doc_id") == 500


def test_dataset_summary_counts(spark, dst):
    s = dataset_summary(spark, dst)
    assert s["rows"] == 500                    # deletes pending, not purged
    assert s["delete_sidecars"] >= 1
    assert s["rows_deleted_pending"] == 2
    assert s["enc_bytes"] > 0 and s["parts"] >= 1
