"""Row-level UPDATE (copy-on-write part rewrite via one `replaces`
manifest append). Contract: standard UPDATE semantics (every SET RHS
sees the pre-update row), byte-identical pass-through for unmatched
rows, deletion vectors honored, atomic commit."""

from pyspark.sql import functions as F

from cpp_parquet_spark.engine import (decode_dataset, delete_where_in,
                                      run_encode, update_where)
from cpp_parquet_spark.partitioning import EncodeConfig

CFG = EncodeConfig(keys=("k",), salt_from=("id",), num_parts=4,
                   table_name="t", bloom_cols=("id",))


def _mk(spark, tmp_path, n=80):
    dst = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(i, f"k{i % 3}", i * 10, f"txt-{i}") for i in range(n)],
        "id long, k string, v long, s string")
    run_encode(spark, df, dst, CFG, run_id="base")
    return dst, df


def test_update_basic(spark, tmp_path):
    dst, df = _mk(spark, tmp_path)
    out = update_where(spark, dst, "id", [5, 7, 9],
                       {"v": "v + 1000", "s": "upper(s)"}, CFG)
    assert out["rows_updated"] == 3
    assert out["parts_rewritten"] >= 1
    got = {r["id"]: (r["v"], r["s"])
           for r in decode_dataset(spark, dst).collect()}
    assert len(got) == 80
    for i in range(80):
        if i in (5, 7, 9):
            assert got[i] == (i * 10 + 1000, f"TXT-{i}".upper())
        else:
            assert got[i] == (i * 10, f"txt-{i}")


def test_update_set_sees_pre_update_row(spark, tmp_path):
    dst = str(tmp_path / "ds")
    df = spark.createDataFrame([(1, "a", 10, 20), (2, "b", 30, 40)],
                               "id long, k string, x long, y long")
    cfg = EncodeConfig(keys=("k",), salt_from=(), num_parts=2,
                       table_name="t", bloom_cols=("id",))
    run_encode(spark, df, dst, cfg, run_id="base")
    # swap x and y: only correct if both RHS evaluate pre-update
    update_where(spark, dst, "id", [1], {"x": "y", "y": "x"}, cfg)
    got = {r["id"]: (r["x"], r["y"])
           for r in decode_dataset(spark, dst).collect()}
    assert got[1] == (20, 10)
    assert got[2] == (30, 40)


def test_update_no_match_is_noop(spark, tmp_path):
    dst, df = _mk(spark, tmp_path)
    out = update_where(spark, dst, "id", [99999], {"v": "v + 1"}, CFG)
    assert out["rows_updated"] == 0
    got = sorted((r["id"], r["v"])
                 for r in decode_dataset(spark, dst).collect())
    assert got == [(i, i * 10) for i in range(80)]


def test_update_respects_prior_deletes(spark, tmp_path):
    dst, df = _mk(spark, tmp_path)
    delete_where_in(spark, dst, "id", [5])
    out = update_where(spark, dst, "id", [5, 6], {"v": "v + 1"}, CFG)
    # row 5 is deleted: not updated, not resurrected by the rewrite
    assert out["rows_updated"] == 1
    got = {r["id"]: r["v"] for r in decode_dataset(spark, dst).collect()}
    assert 5 not in got and got[6] == 61
    assert len(got) == 79


def test_update_preserves_time_travel(spark, tmp_path):
    import time
    dst, df = _mk(spark, tmp_path)
    time.sleep(1.1)
    import datetime
    before = datetime.datetime.now()
    time.sleep(1.1)
    update_where(spark, dst, "id", [3], {"v": "0 - 1"}, CFG)
    now = {r["id"]: r["v"] for r in decode_dataset(spark, dst).collect()}
    assert now[3] == -1
    old = {r["id"]: r["v"]
           for r in decode_dataset(spark, dst, as_of=before).collect()}
    assert old[3] == 30 and len(old) == 80
