"""Metadata-only exact aggregates: the ``__agg__`` sidecar rows the
encode kernel writes per (part, column) and the ``column_agg_fast``
reader over them. The contract under test: SUM/AVG are EXACT (arbitrary-
precision integer arithmetic, no int64 wrap) whenever legal, and come
back NULL — never a wrong number — whenever any part lacks coverage or
deletion vectors exist."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark.engine import (column_agg_fast, compact_parts,
                                      decode_table, delete_where_in,
                                      encode_table, read_live_pages,
                                      run_encode, _exact_int_sum)
from cpp_parquet_spark.partitioning import EncodeConfig

CFG = EncodeConfig(keys=("k",), salt_from=(), num_parts=2, table_name="t")


def _enc(spark, rows, schema, **kw):
    cfg = EncodeConfig(keys=(schema.split()[0],), salt_from=(),
                       num_parts=2, table_name="t", **kw)
    return encode_table(spark.createDataFrame(rows, schema), cfg).cache()


def test_sum_matches_truth_documents(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EncodeConfig(keys=("source",), salt_from=("doc_id",),
                       num_parts=4, table_name="documents")
    pages = encode_table(df, cfg).cache()
    got = column_agg_fast(pages, "n_chars").collect()[0]
    exp = df.agg(F.count("n_chars"), F.sum("n_chars"), F.avg("n_chars"),
                 F.min("n_chars"), F.max("n_chars")).collect()[0]
    assert got["n"] == exp[0]
    assert int(got["sum_v"]) == exp[1]
    assert got["avg_v"] == pytest.approx(exp[2], rel=1e-12)
    assert got["min_v"] == exp[3] and got["max_v"] == exp[4]
    assert got["nulls"] == 0


def test_int64_extremes_no_wrap(spark):
    # four 2^62 values wrap a naive int64 np.sum; the hi/lo split must not
    rows = [(1, 2 ** 62), (2, 2 ** 62), (3, 2 ** 62), (4, 2 ** 62),
            (5, -(2 ** 63)), (6, None), (7, 2 ** 63 - 1)]
    pages = _enc(spark, rows, "id long, v long")
    got = column_agg_fast(pages, "v").collect()[0]
    exp = sum(v for _, v in rows if v is not None)
    assert int(got["sum_v"]) == exp
    assert got["nulls"] == 1 and got["n"] == 6


def test_exact_int_sum_kernel_unit():
    import numpy as np
    import pyarrow as pa
    v = [2 ** 62, 2 ** 62, -(2 ** 63), 2 ** 63 - 1, -1, 0]
    s, n = _exact_int_sum(pa.array(v, pa.int64()), "i64")
    assert s == sum(v) and n == len(v)
    assert int(np.sum(np.array(v[:2], np.int64))) != sum(v[:2])  # wraps
    s2, n2 = _exact_int_sum(pa.array([True, False, True, None]), "bool")
    assert (s2, n2) == (2, 3)
    assert _exact_int_sum(pa.array([1.5]), "f64") is None


def test_bool_and_timestamp(spark):
    rows = [(1, True, datetime.datetime(2024, 1, 1)),
            (2, False, datetime.datetime(2024, 1, 3)),
            (3, True, datetime.datetime(2024, 1, 5)),
            (4, None, None)]
    pages = _enc(spark, rows, "id long, b boolean, ts timestamp")
    gb = column_agg_fast(pages, "b").collect()[0]
    assert int(gb["sum_v"]) == 2 and gb["n"] == 3 and gb["nulls"] == 1
    gt = column_agg_fast(pages, "ts").collect()[0]
    # sum/avg of epoch-microseconds; mean of 1/3/5 Jan = 3 Jan
    mean_us = int(gt["sum_v"]) / gt["n"]
    assert mean_us == datetime.datetime(
        2024, 1, 3, tzinfo=datetime.timezone.utc).timestamp() * 1e6


def test_decimal_scaled_sum(spark):
    rows = [(1, Decimal("12.34")), (2, Decimal("-0.04")),
            (3, Decimal("100.00")), (4, None)]
    pages = _enc(spark, rows, "id long, d decimal(9,2)")
    got = column_agg_fast(pages, "d").collect()[0]
    assert got["sum_v"] == Decimal("112.30")
    assert got["nulls"] == 1


def test_float_and_string_sum_is_null(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_id", "value", "event_type")
    cfg = EncodeConfig(keys=("event_id",), salt_from=(), num_parts=2,
                       table_name="ev")
    pages = encode_table(ev, cfg).cache()
    for col in ("value", "event_type"):
        got = column_agg_fast(pages, col).collect()[0]
        assert got["sum_v"] is None and got["avg_v"] is None
        assert got["n"] is not None  # count stays exact


def test_uncovered_part_means_null_not_wrong(spark):
    rows = [(i, i * 10) for i in range(100)]
    pages = _enc(spark, rows, "id long, v long")
    # simulate a pre-sidecar part: drop the __agg__ rows of one part_id
    part0 = pages.filter(F.col("col_idx") >= 0).select("part_id") \
        .distinct().orderBy("part_id").collect()[0][0]
    stripped = pages.filter(~((F.col("codec") == "__agg__")
                              & (F.col("part_id") == part0)))
    got = column_agg_fast(stripped, "v").collect()[0]
    assert got["sum_v"] is None and got["avg_v"] is None
    assert got["n"] == 100  # count comes from data-page metadata


def test_deletes_blind_the_sum(spark, tmp_path):
    dst = str(tmp_path / "ds")
    df = spark.createDataFrame([(i, f"k{i % 3}", i) for i in range(60)],
                               "id long, k string, v long")
    cfg = EncodeConfig(keys=("k",), salt_from=(), num_parts=2,
                       table_name="t", bloom_cols=("id",))
    run_encode(spark, df, dst, cfg, run_id="r1")
    pages = read_live_pages(spark, dst)
    before = column_agg_fast(pages, "v").collect()[0]
    assert int(before["sum_v"]) == sum(range(60))
    delete_where_in(spark, dst, "id", [5, 7])
    after = column_agg_fast(read_live_pages(spark, dst), "v").collect()[0]
    assert after["sum_v"] is None  # deleted rows still inside stored sums


def test_compaction_preserves_sums(spark, tmp_path):
    dst = str(tmp_path / "ds")
    cfg = EncodeConfig(keys=("k",), salt_from=(), num_parts=2,
                       table_name="t")
    total = 0
    for r in range(3):  # three tiny runs -> small parts -> compactable
        df = spark.createDataFrame(
            [(r * 100 + i, f"k{i % 2}", r * 100 + i) for i in range(50)],
            "id long, k string, v long")
        run_encode(spark, df, dst, cfg, run_id=f"r{r}", resume=False)
        total += sum(r * 100 + i for i in range(50))
    before = column_agg_fast(read_live_pages(spark, dst), "v").collect()[0]
    assert int(before["sum_v"]) == total
    out = compact_parts(spark, dst, min_bytes=8 << 20)
    assert out["parts_compacted"] > 0
    after = column_agg_fast(read_live_pages(spark, dst), "v").collect()[0]
    assert int(after["sum_v"]) == total and after["n"] == before["n"]


def test_decode_unaffected_by_agg_rows(spark):
    rows = [(i, i * 3, f"s{i}") for i in range(40)]
    pages = _enc(spark, rows, "id long, v long, s string")
    assert pages.filter(F.col("codec") == "__agg__").count() > 0
    dec = decode_table(pages)
    assert sorted(tuple(r) for r in dec.collect()) == sorted(rows)


def test_ndv_fast_accuracy_and_merge(spark, sf_dir):
    from cpp_parquet_spark.engine import column_ndv_fast
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EncodeConfig(keys=("source",), salt_from=("doc_id",),
                       num_parts=4, table_name="documents",
                       bloom_cols=("source",))
    pages = encode_table(df, cfg).cache()
    # int column: sketch always present; ~500 distinct doc_ids
    got = column_ndv_fast(pages, "doc_id")
    exact = df.select("doc_id").distinct().count()
    assert got is not None and got["parts"] >= 4
    assert abs(got["ndv"] - exact) / exact < 0.05, (got, exact)
    # low-cardinality bloom-indexed string: linear counting is near-exact
    got_s = column_ndv_fast(pages, "source")
    exact_s = df.select("source").distinct().count()
    assert got_s is not None
    assert abs(got_s["ndv"] - exact_s) <= 1, (got_s, exact_s)
    # unindexed string column: no sketch -> None (absence means exact scan)
    assert column_ndv_fast(pages, "text") is None
    pages.unpersist()


def test_ndv_fast_string_via_ndv_cols(spark, sf_dir):
    """cfg.ndv_cols (round 4): an HLL sketch for a string column WITHOUT
    a bloom index — opt-in because it costs one object-hash pass."""
    from cpp_parquet_spark.engine import column_ndv_fast
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EncodeConfig(keys=("source",), salt_from=("doc_id",),
                       num_parts=4, table_name="documents",
                       ndv_cols=("text", "lang"))
    pages = encode_table(df, cfg).cache()
    try:
        for col in ("text", "lang"):
            got = column_ndv_fast(pages, col)
            exact = df.select(col).distinct().count()
            assert got is not None, col
            assert abs(got["ndv"] - exact) / max(exact, 1) < 0.05, \
                (col, got, exact)
        # and no bloom sidecar rode along (ndv_cols is sketch-only)
        assert pages.filter("codec = '__bloom__'").count() == 0
    finally:
        pages.unpersist()


def test_ndv_fast_merges_across_runs(spark, tmp_path):
    from cpp_parquet_spark.engine import column_ndv_fast, read_live_pages
    dst = str(tmp_path / "nv")
    cfg = EncodeConfig(keys=("k",), salt_from=(), num_parts=2,
                       table_name="t")
    # two runs with overlapping domains: merged NDV must reflect the
    # UNION of distinct values, not the sum of per-run counts
    a = spark.createDataFrame([(i, f"k{i % 2}", i % 100)
                               for i in range(500)],
                              "id long, k string, v long")
    b = spark.createDataFrame([(i + 500, f"k{i % 2}", (i % 100) + 50)
                               for i in range(500)],
                              "id long, k string, v long")
    run_encode(spark, a, dst, cfg, run_id="r1")
    run_encode(spark, b, dst, cfg, run_id="r2", resume=False)
    got = column_ndv_fast(read_live_pages(spark, dst), "v")
    assert got is not None
    assert abs(got["ndv"] - 150) / 150 < 0.06, got   # union is 0..149


def test_ndv_fast_partial_coverage_returns_none(spark, tmp_path):
    """bloom_cols added between appends: run r1's parts carry no sketch
    for the string column, so a merged estimate would silently
    undercount — the reader must return None (exact-scan fallback)."""
    from cpp_parquet_spark.engine import column_ndv_fast, read_live_pages
    dst = str(tmp_path / "pc")
    a = spark.createDataFrame([(i, f"k{i}", f"s{i % 7}")
                               for i in range(100)],
                              "id long, k string, s string")
    b = spark.createDataFrame([(i + 100, f"k{i}", f"s{(i % 7) + 5}")
                               for i in range(100)],
                              "id long, k string, s string")
    cfg_plain = EncodeConfig(keys=("k",), salt_from=(), num_parts=2,
                             table_name="t")
    cfg_bloom = EncodeConfig(keys=("k",), salt_from=(), num_parts=2,
                             table_name="t", bloom_cols=("s",))
    run_encode(spark, a, dst, cfg_plain, run_id="r1")
    run_encode(spark, b, dst, cfg_bloom, run_id="r2", resume=False)
    pages = read_live_pages(spark, dst)
    assert column_ndv_fast(pages, "s") is None     # partial -> fallback
    got = column_ndv_fast(pages, "id")             # int: always covered
    assert got is not None and abs(got["ndv"] - 200) / 200 < 0.05


def test_mixed_run_coverage_blinds_sum(spark, tmp_path):
    """Appended runs reuse the hash part-id space: a part_id holding a
    pre-sidecar run AND a sidecar-bearing run must NOT count as covered
    — part_id-only coverage would return a silently partial sum."""
    dst = str(tmp_path / "mr")
    cfg = EncodeConfig(keys=("k",), salt_from=(), num_parts=2,
                       table_name="t")
    a = spark.createDataFrame([(i, f"k{i % 2}", i) for i in range(50)],
                              "id long, k string, v long")
    b = spark.createDataFrame([(i + 50, f"k{i % 2}", i + 50)
                               for i in range(50)],
                              "id long, k string, v long")
    run_encode(spark, a, dst, cfg, run_id="r1")
    run_encode(spark, b, dst, cfg, run_id="r2", resume=False)
    pages = read_live_pages(spark, dst)
    # simulate r1 predating the __agg__ sidecar: strip ONLY r1's rows —
    # every part_id still has r2 agg rows, so a part_id-only check
    # would wrongly call the column covered
    stripped = pages.filter(~((F.col("codec") == "__agg__")
                              & (F.col("run_id") == "r1")))
    got = column_agg_fast(stripped, "v").collect()[0]
    assert got["sum_v"] is None and got["avg_v"] is None
    assert got["n"] == 100
    # untouched dataset: exact
    full = column_agg_fast(pages, "v").collect()[0]
    assert int(full["sum_v"]) == sum(range(100))


def test_overlapping_deletes_blind_the_count(spark, tmp_path):
    """Two deletion sidecars marking the same row: decode ORs the
    bitmaps (one row gone) but sum(n_del) double-counts — both fast
    readers must go blind on n, never report one too few."""
    from cpp_parquet_spark.engine import column_stats_fast
    dst = str(tmp_path / "ov")
    df = spark.createDataFrame([(i, f"k{i % 2}", i) for i in range(40)],
                               "id long, k string, v long")
    cfg = EncodeConfig(keys=("k",), salt_from=(), num_parts=2,
                       table_name="t")
    run_encode(spark, df, dst, cfg, run_id="r1")
    delete_where_in(spark, dst, "id", [5])
    delete_where_in(spark, dst, "id", [5, 6])   # re-marks row 5
    pages = read_live_pages(spark, dst)
    from cpp_parquet_spark.engine import decode_dataset
    assert decode_dataset(spark, dst).count() == 38   # decode is right
    sfast = column_stats_fast(pages, "v").collect()[0]
    afast = column_agg_fast(pages, "v").collect()[0]
    assert sfast["n"] is None                    # blind, not 37
    assert afast["n"] is None and afast["sum_v"] is None
    # single non-overlapping delete stays exact
    dst2 = str(tmp_path / "ov2")
    run_encode(spark, df, dst2, cfg, run_id="r1")
    delete_where_in(spark, dst2, "id", [5, 6])
    s2 = column_stats_fast(read_live_pages(spark, dst2), "v").collect()[0]
    assert s2["n"] == 38
