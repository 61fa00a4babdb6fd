"""Skew handling (BASELINE.json:6): a Zipf-head repo holding >=50% of rows
must be fanned out by the salted partitioner so no part becomes a straggler
(SURVEY.md §5.2 item 6: max-part-bytes / median <= 4)."""

import statistics

from pyspark.sql import functions as F

from cpp_parquet_spark import synth
from cpp_parquet_spark.engine import encode_table
from cpp_parquet_spark.partitioning import EncodeConfig, with_part_id


def test_salting_bounds_partition_skew(spark):
    df = spark.read.parquet(synth.fixture_path("sf0.001", skew=True))
    # sanity: the fixture is actually skewed
    top = (df.groupBy("repo").agg(F.sum(F.octet_length("content")).alias("b"))
             .orderBy(F.desc("b")).first())
    total = df.select(F.sum(F.octet_length("content"))).collect()[0][0]
    assert top["b"] / total > 0.5, "fixture lost its skew"

    cfg = EncodeConfig(keys=("repo",), salt_from=("path",), salt_buckets=32,
                       num_parts=16, table_name="repofiles_skew")
    sizes = (with_part_id(df, cfg)
             .groupBy("__part_id")
             .agg(F.sum(F.octet_length("content")).alias("b"))
             .collect())
    per_part = sorted(r["b"] for r in sizes)
    assert len(per_part) >= 12, "salting failed to spread the hot repo"
    ratio = per_part[-1] / statistics.median(per_part)
    assert ratio <= 4, f"max/median part bytes = {ratio:.2f}"


def test_unsalted_would_hotspot(spark):
    """Negative control: without the salt, the hot repo lands in one part."""
    df = spark.read.parquet(synth.fixture_path("sf0.001", skew=True))
    cfg = EncodeConfig(keys=("repo",), salt_from=(), num_parts=16,
                       table_name="repofiles_skew")
    sizes = (with_part_id(df, cfg)
             .groupBy("__part_id")
             .agg(F.sum(F.octet_length("content")).alias("b")).collect())
    per_part = sorted(r["b"] for r in sizes)
    total = sum(per_part)
    assert per_part[-1] / total > 0.5  # the hot repo is one indivisible part


def test_pack_sequences_global_window_guard(spark):
    """Multi-partition input without group_cols must raise (one global
    window partition would funnel the table through a single task)."""
    import pytest
    from cpp_parquet_spark.textops import pack_sequences
    df = spark.range(0, 1000, 1, 8).selectExpr(
        "id as doc_id", "10 as ln")
    with pytest.raises(ValueError, match="GLOBAL window"):
        pack_sequences(df, "ln", 128)
    # single-partition (test-sized) input stays allowed
    one = df.coalesce(1)
    assert pack_sequences(one, "ln", 128).count() == 1000


def test_plan_range_bounds_domain_guard(spark):
    """A high-cardinality string range key must be refused, not funneled
    through the single-partition distinct-quantile window."""
    import pytest
    from pyspark.sql import functions as F
    from cpp_parquet_spark.partitioning import plan_range_bounds
    big = spark.range(0, 200_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    with pytest.raises(ValueError, match="distinct string keys"):
        plan_range_bounds(big, "k", 16)
    # small domains still work
    small = spark.range(0, 10_000).select(
        F.concat(F.lit("repo_"), (F.col("id") % 50)).alias("k"))
    bounds = plan_range_bounds(small, "k", 5)
    assert len(bounds) == 4 and list(bounds) == sorted(bounds)
