"""Net change-data-feed between snapshots (engine.table_changes — the
Delta CDF / Iceberg incremental-read analogue): inserts and deletes that
turn snapshot A into snapshot B, metadata-pruned to the changed parts."""

import datetime
import time

import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark.engine import (EncodeConfig, compact_parts,
                                      delete_where_in, run_encode,
                                      table_changes)


@pytest.fixture()
def docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang"))


def _cfg(**over):
    base = dict(keys=("doc_id",), salt_from=("doc_id",), num_parts=4,
                order_keys=("doc_id",), bloom_cols=("doc_id",),
                table_name="docs_cdc")
    base.update(over)
    return EncodeConfig(**base)


def _stamp():
    # manifest commit timestamps come from current_timestamp(); separate
    # commits from the probe instant on both sides
    time.sleep(0.8)
    t = datetime.datetime.now()
    time.sleep(0.8)
    return t


def test_append_only_window_is_all_inserts(spark, docs, tmp_path):
    dst = str(tmp_path / "cdc1")
    cfg = _cfg()
    run_encode(spark, docs.filter(F.col("doc_id") < 200), dst, cfg,
               run_id="r1", resume=False)
    t0 = _stamp()
    run_encode(spark, docs.filter(F.col("doc_id") >= 200), dst, cfg,
               run_id="r2", resume=False)
    ch = table_changes(spark, dst, t0)
    assert ch.filter(F.col("_change_type") == "delete").count() == 0
    ins = ch.filter(F.col("_change_type") == "insert") \
            .drop("_change_type")
    src = docs.filter(F.col("doc_id") >= 200)
    assert ins.exceptAll(src).count() == 0
    assert src.exceptAll(ins).count() == 0


def test_delete_only_window_and_net_cancel(spark, docs, tmp_path):
    dst = str(tmp_path / "cdc2")
    cfg = _cfg()
    run_encode(spark, docs.filter(F.col("doc_id") < 200), dst, cfg,
               run_id="r1", resume=False)
    t0 = _stamp()
    # appended-then-deleted inside the window: net NOTHING for id 300
    run_encode(spark, docs.filter(F.col("doc_id") >= 200), dst, cfg,
               run_id="r2", resume=False)
    delete_where_in(spark, dst, "doc_id", [5, 300])
    ch = table_changes(spark, dst, t0)
    dels = {r["doc_id"] for r in
            ch.filter(F.col("_change_type") == "delete")
              .select("doc_id").collect()}
    assert dels == {5}
    ins = {r["doc_id"] for r in
           ch.filter(F.col("_change_type") == "insert")
             .select("doc_id").collect()}
    assert 300 not in ins
    assert ins == {r["doc_id"] for r in
                   docs.filter(F.col("doc_id") >= 200).select("doc_id")
                       .collect()} - {300}


def test_bounded_window_and_empty_window(spark, docs, tmp_path):
    dst = str(tmp_path / "cdc3")
    cfg = _cfg()
    run_encode(spark, docs.filter(F.col("doc_id") < 100), dst, cfg,
               run_id="r1", resume=False)
    t0 = _stamp()
    delete_where_in(spark, dst, "doc_id", [7])
    t1 = _stamp()
    run_encode(spark, docs.filter(F.col("doc_id") >= 100), dst, cfg,
               run_id="r2", resume=False)
    # (t0, t1] sees only the delete, not the later append
    ch = table_changes(spark, dst, t0, t1)
    rows = ch.collect()
    assert {(r["_change_type"], r["doc_id"]) for r in rows} == {
        ("delete", 7)}
    # empty window: typed empty frame, data columns + _change_type
    empty = table_changes(spark, dst, t1, t1)
    assert empty.count() == 0
    assert set(empty.columns) == {"doc_id", "text", "lang",
                                  "_change_type"}


def test_compaction_rewrite_reports_no_logical_change(spark, docs,
                                                      tmp_path):
    dst = str(tmp_path / "cdc4")
    cfg = _cfg(num_parts=8)
    run_encode(spark, docs.filter(F.col("doc_id") < 150), dst, cfg,
               run_id="r1", resume=False)
    t0 = _stamp()
    st = compact_parts(spark, dst, min_bytes=1 << 30,
                       target_bytes=1 << 30)
    assert st["parts_compacted"] > 0   # the rewrite really happened
    assert table_changes(spark, dst, t0).count() == 0


def test_schema_evolution_inside_window(spark, docs, tmp_path):
    dst = str(tmp_path / "cdc5")
    cfg = _cfg()
    run_encode(spark, docs.filter(F.col("doc_id") < 100), dst, cfg,
               run_id="r1", resume=False)
    t0 = _stamp()
    delete_where_in(spark, dst, "doc_id", [3])
    run_encode(spark,
               docs.filter(F.col("doc_id") >= 100)
                   .withColumn("stars", F.col("doc_id") * 2),
               dst, cfg, run_id="r2", resume=False)
    ch = table_changes(spark, dst, t0)
    assert "stars" in ch.columns
    # the deleted r1 row predates the new column: NULL there
    d = ch.filter(F.col("_change_type") == "delete").collect()
    assert [(r["doc_id"], r["stars"]) for r in d] == [(3, None)]
    i = ch.filter(F.col("_change_type") == "insert")
    assert i.filter(F.col("stars") != F.col("doc_id") * 2).count() == 0
    assert i.count() == docs.filter(F.col("doc_id") >= 100).count()
