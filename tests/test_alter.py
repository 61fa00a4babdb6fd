"""ALTER TABLE ADD/DROP COLUMN as copy-on-write rewrites (atomic
`replaces` commit, time travel preserved)."""

import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark.engine import (add_column, decode_dataset,
                                      drop_column, run_encode)
from cpp_parquet_spark.partitioning import EncodeConfig

CFG = EncodeConfig(keys=("k",), salt_from=("id",), num_parts=4,
                   table_name="t")


def _mk(spark, tmp_path, n=60):
    dst = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(i, f"k{i % 3}", i * 10, f"w{i} " * (i % 5 + 1)) for i in range(n)],
        "id long, k string, v long, s string")
    run_encode(spark, df, dst, CFG, run_id="base")
    return dst


def test_add_column_backfills_everywhere(spark, tmp_path):
    dst = _mk(spark, tmp_path)
    out = add_column(spark, dst, "n_words",
                     "size(split(trim(s), ' +'))", CFG)
    assert out["parts_rewritten"] >= 1 and out["rows"] == 60
    got = {r["id"]: (r["v"], r["n_words"])
           for r in decode_dataset(spark, dst).collect()}
    assert len(got) == 60
    for i in range(60):
        assert got[i] == (i * 10, i % 5 + 1)


def test_add_column_rejects_existing(spark, tmp_path):
    dst = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        add_column(spark, dst, "v", "v + 1", CFG)


def test_add_column_time_travel_shows_old_schema(spark, tmp_path):
    import datetime
    import time
    dst = _mk(spark, tmp_path)
    time.sleep(1.1)
    before = datetime.datetime.now()
    time.sleep(1.1)
    add_column(spark, dst, "flag", "v > 100", CFG)
    now = decode_dataset(spark, dst)
    assert "flag" in now.columns and now.count() == 60
    old = decode_dataset(spark, dst, as_of=before)
    assert "flag" not in old.columns and old.count() == 60


def test_drop_column_reclaims(spark, tmp_path):
    dst = _mk(spark, tmp_path)
    out = drop_column(spark, dst, "s", CFG)
    assert out["rows"] == 60
    dec = decode_dataset(spark, dst)
    assert sorted(dec.columns) == ["id", "k", "v"]
    assert dec.count() == 60
    with pytest.raises(ValueError, match="not present"):
        drop_column(spark, dst, "nope", CFG)
