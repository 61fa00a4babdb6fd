"""asof_join (union-sort formulation): semantics pinned against
hand-computed expectations, NULL-payload no-fallback, tolerance,
forward direction, and the no-range-explosion plan shape."""

import pytest
from pyspark.sql import Row, functions as F

from cpp_parquet_spark.joins import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 35.0),
         (4, "b", 5.0), (5, "b", 50.0), (6, "c", 7.0)],
        "id long, k string, t double")
    right = spark.createDataFrame(
        [("a", 10.0, 100.0), ("a", 30.0, 300.0),
         ("b", 6.0, 60.0), ("b", 49.0, None)],
        "k string, t double, v double")
    return left, right


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_backward_basic(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="t", by=("k",))
    assert _rows(out.select("id", "r_t", "r_v")) == {
        (1, 10.0, 100.0),     # equal ts matches (at-or-before)
        (2, 10.0, 100.0),
        (3, 30.0, 300.0),
        (4, None, None),      # nothing at-or-before
        (5, 49.0, None),      # matched row with NULL payload stays NULL
        (6, None, None),      # key with no right rows
    }


def test_forward_and_tolerance(spark, frames):
    left, right = frames
    fwd = asof_join(left, right, on="t", by=("k",), direction="forward")
    assert _rows(fwd.select("id", "r_t")) == {
        (1, 10.0), (2, 30.0), (3, None), (4, 6.0), (5, None), (6, None)}
    tol = asof_join(left, right, on="t", by=("k",), tolerance=5.0)
    # id 2 is 10 units past its match -> nulled; id 1/3 within 5
    assert _rows(tol.select("id", "r_t")) == {
        (1, 10.0), (2, None), (3, 30.0), (4, None), (5, 49.0),
        (6, None)}


def test_no_by_and_collision_guard(spark, frames):
    left, right = frames
    # empty `by` is REFUSED (round 4): Window.partitionBy() of nothing
    # would funnel the whole union through one task — a global as-of
    # must bucket the time axis and pass the bucket as `by` instead
    with pytest.raises(ValueError, match="single-partition"):
        asof_join(left.select("id", "t"), right.select("t", "v"), on="t")
    # the global semantics survive via a constant bucket key, explicit
    bl = left.select("id", "t").withColumn("bk", F.lit(0))
    br = right.select("t", "v").withColumn("bk", F.lit(0))
    out = asof_join(bl, br, on="t", by=("bk",))
    # keys ignored: the global right timeline {6,10,30,49} applies
    assert _rows(out.filter(F.col("id") == 4).select("r_t")) == {(None,)}
    assert _rows(out.filter(F.col("id") == 2).select("r_t")) == {(10.0,)}
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("r_v", F.lit(1)), right, on="t",
                  by=("k",))


def test_left_rows_and_columns_preserved(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="t", by=("k",))
    assert out.count() == left.count()
    assert out.columns == ["id", "k", "t", "r_t", "r_v"]
    assert _rows(out.select("id", "k", "t")) == _rows(left)


def test_plan_has_no_join_explosion(spark, frames):
    """The whole as-of is union + ONE window sort: the physical plan
    must contain a Window and NO join operator of any kind (the naive
    inequality formulation plans a BroadcastNestedLoopJoin or a range
    cross product)."""
    left, right = frames
    plan = asof_join(left, right, on="t", by=("k",)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_timestamp_tolerance_seconds(spark):
    left = spark.createDataFrame(
        [Row(id=1, k=0, ts="2024-01-01 00:10:00")]).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [Row(k=0, ts="2024-01-01 00:00:00", v=1.0)]).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    hit = asof_join(left, right, on="ts", by=("k",), tolerance=600.0)
    miss = asof_join(left, right, on="ts", by=("k",), tolerance=599.0)
    assert hit.collect()[0]["r_v"] == 1.0
    assert miss.collect()[0]["r_v"] is None
