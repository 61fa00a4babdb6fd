"""export_parquet: the distributed standard-parquet sink.

Executor-side files from OUR writer must be consumed bit-exactly by
three independent readers — Spark's JVM parquet-java, pyarrow's C++
reader, and DuckDB — and carry our Statistics + PageIndex sidecars."""

import glob
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from cpp_parquet_spark.export import export_parquet


def _fingerprint(df):
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("N"))
            for c in df.columns]
    h = F.sha2(F.concat_ws("|", *cols).cast("binary"), 256)
    return (df.select(h.alias("h"))
            .agg(F.bit_xor(F.conv(F.substring("h", 1, 15), 16, 10)
                           .cast("long")).alias("x"),
                 F.count("*").alias("n")).collect()[0])


def test_export_three_readers_exact(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dst = str(tmp_path / "docs")
    man = export_parquet(df.repartition(3), dst,
                         dictionary={"lang", "source"},
                         page_rows=20, row_group_rows=40)
    rows = [r for r in man.collect() if r.file]
    assert len(rows) == 3
    assert sum(r.rows for r in rows) == df.count()
    back = spark.read.parquet(dst)
    assert tuple(_fingerprint(back)) == tuple(_fingerprint(df))
    # pyarrow: stats + page index present on every file
    for f in glob.glob(os.path.join(dst, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        c0 = md.row_group(0).column(0)
        assert c0.statistics is not None and c0.statistics.has_min_max
        assert c0.has_column_index
    # duckdb
    n, s = duckdb.sql(
        f"SELECT count(*), sum(doc_id) FROM "
        f"read_parquet('{dst}/*.parquet')").fetchall()[0]
    exp = df.agg(F.count("*"), F.sum("doc_id")).collect()[0]
    assert (n, s) == tuple(exp)


def test_export_list_columns(spark, tmp_path):
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id",
                  F.split("text", " ").alias("toks"),
                  F.expr("CASE WHEN doc_id % 7 = 0 THEN NULL "
                         "ELSE sequence(1, 1 + CAST(doc_id % 4 AS INT)) "
                         "END").alias("seq")))
    dst = str(tmp_path / "lists")
    export_parquet(df.repartition(2), dst, compression="snappy").collect()
    back = spark.read.parquet(dst)
    a = (df.select("doc_id", F.concat_ws(" ", "toks").alias("t"),
                   F.coalesce(F.expr("aggregate(seq, 0L, (a, x) -> a + x)"),
                              F.lit(-1)).alias("s")))
    b = (back.select("doc_id", F.concat_ws(" ", "toks").alias("t"),
                     F.coalesce(F.expr("aggregate(seq, 0L, (a, x) -> a + x)"),
                                F.lit(-1)).alias("s")))
    assert tuple(_fingerprint(a)) == tuple(_fingerprint(b))


def test_export_rejects_unsupported_types(spark, tmp_path):
    # nested-inside-nested stays out of scope: map values that are
    # arrays can't flow through the one-level Dremel writer
    df = spark.range(3).select(
        F.col("id"),
        F.create_map(F.lit("k"), F.array(F.col("id"))).alias("m"))
    with pytest.raises(ValueError, match="unsupported column types"):
        export_parquet(df, str(tmp_path / "bad"))


def test_export_nulls_and_empty_partition(spark, tmp_path):
    df = (spark.range(100)
          .select(F.when(F.col("id") % 5 == 0, None)
                  .otherwise(F.col("id")).alias("v"),
                  F.when(F.col("id") % 3 == 0, None)
                  .otherwise(F.concat(F.lit("s"), F.col("id")))
                  .alias("s")))
    dst = str(tmp_path / "nulls")
    # more partitions than rows in some -> empty-partition path
    export_parquet(df.repartition(8), dst, page_rows=10).collect()
    back = spark.read.parquet(dst)
    assert tuple(_fingerprint(back)) == tuple(_fingerprint(df))


def test_scan_parquet_roundtrip_projection_prune(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from cpp_parquet_spark.export import scan_parquet
    dst = str(tmp_path / "scan")
    export_parquet(df.repartitionByRange(4, "doc_id"), dst,
                   dictionary={"lang"}, page_rows=10,
                   row_group_rows=20).collect()
    back = scan_parquet(spark, dst)
    assert tuple(_fingerprint(back.select(*df.columns))) == \
        tuple(_fingerprint(df))
    # projection decodes only the requested chunks
    proj = scan_parquet(spark, dst, columns=["doc_id", "lang"])
    assert sorted(proj.columns) == ["doc_id", "lang"]
    assert proj.count() == df.count()
    # metadata-only file pruning: range-partitioned files have disjoint
    # doc_id windows, so a narrow range must drop files
    pruned = scan_parquet(spark, dst, range_prune=("doc_id", 5, 15))
    assert pruned.rdd.getNumPartitions() < 4
    got = pruned.filter("doc_id between 5 and 15") \
        .agg(F.sum("doc_id"), F.count("*")).collect()[0]
    exp = df.filter("doc_id between 5 and 15") \
        .agg(F.sum("doc_id"), F.count("*")).collect()[0]
    assert tuple(got) == tuple(exp)


def test_scan_parquet_list_column(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", F.split("text", " ").alias("toks")))
    dst = str(tmp_path / "scanlist")
    export_parquet(df.repartition(2), dst).collect()
    back = scan_parquet(spark, dst)
    a = df.select("doc_id", F.concat_ws(" ", "toks").alias("t"))
    b = back.select("doc_id", F.concat_ws(" ", "toks").alias("t"))
    assert tuple(_fingerprint(b)) == tuple(_fingerprint(a))


def test_scan_parquet_all_files_pruned_is_empty(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = spark.range(100).select(F.col("id").alias("v"))
    dst = str(tmp_path / "allpruned")
    export_parquet(df.repartition(2), dst).collect()
    out = scan_parquet(spark, dst, range_prune=("v", 10**9, 2 * 10**9))
    assert out.count() == 0
    assert out.columns == ["v"]


def test_scan_parquet_row_group_granular_pruning(spark, tmp_path):
    # one file, many row groups sorted on v: a narrow range must decode
    # only the matching ROW GROUPS, not the whole file
    from cpp_parquet_spark.export import scan_parquet, _rg_stats
    import glob
    df = (spark.range(10000).select(F.col("id").alias("v"))
          .coalesce(1).sortWithinPartitions("v"))
    dst = str(tmp_path / "rgprune")
    export_parquet(df, dst, row_group_rows=1000, page_rows=250).collect()
    f = glob.glob(dst + "/*.parquet")[0]
    assert len(_rg_stats(f)) == 10
    out = scan_parquet(spark, dst, range_prune=("v", 2500, 3500))
    n_all = out.count()
    # rgs 2-3 only: 2000 rows survive the rg prune
    assert n_all == 2000
    got = out.filter("v between 2500 and 3500").agg(
        F.count("*"), F.sum("v")).collect()[0]
    exp = df.filter("v between 2500 and 3500").agg(
        F.count("*"), F.sum("v")).collect()[0]
    assert tuple(got) == tuple(exp)


def test_scan_parquet_apply_range_in_worker(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = (spark.range(10000).select(F.col("id").alias("v"),
                                    F.concat(F.lit("s"), F.col("id"))
                                    .alias("s"))
          .coalesce(1).sortWithinPartitions("v"))
    dst = str(tmp_path / "applyrange")
    export_parquet(df, dst, row_group_rows=1000).collect()
    out = scan_parquet(spark, dst, range_prune=("v", 2500, 3500),
                       apply_range=True)
    # the exact predicate applied in-worker: every surviving row matches
    assert out.count() == 1001
    got = out.agg(F.sum("v"), F.count("*")).collect()[0]
    exp = df.filter("v between 2500 and 3500") \
        .agg(F.sum("v"), F.count("*")).collect()[0]
    assert tuple(got) == tuple(exp)
    with pytest.raises(ValueError, match="apply_range"):
        scan_parquet(spark, dst, columns=["s"],
                     range_prune=("v", 1, 2), apply_range=True)


def test_spark_pushes_filters_into_our_files(spark, tmp_path):
    # parquet-mr consumes OUR row-group Statistics: the physical plan
    # shows PushedFilters against the exported files and the filtered
    # result is exact
    df = (spark.range(50000).select(F.col("id").alias("v"))
          .coalesce(1).sortWithinPartitions("v"))
    dst = str(tmp_path / "push")
    export_parquet(df, dst, row_group_rows=5000).collect()
    back = spark.read.parquet(dst).filter("v between 5000 and 6000")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(v), GreaterThanOrEqual(v,5000)" \
        in plan
    assert back.count() == 1001


def test_export_scan_struct_column(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = (spark.range(500).select(
        F.col("id").alias("v"),
        F.when(F.col("id") % 7 == 0, None).otherwise(
            F.struct(F.col("id").alias("u"),
                     F.when(F.col("id") % 3 == 0, None)
                     .otherwise(F.concat(F.lit("s"), F.col("id")))
                     .alias("w"))).alias("st")))
    dst = str(tmp_path / "structs")
    export_parquet(df.repartition(3), dst).collect()
    proj = ["v", F.col("st.u"), F.col("st.w"),
            F.col("st").isNull().alias("n")]
    a = df.select(*proj)
    for back in (spark.read.parquet(dst), scan_parquet(spark, dst)):
        b = back.select("v", F.col("st.u"), F.col("st.w"),
                        F.col("st").isNull().alias("n"))
        assert tuple(_fingerprint(b)) == tuple(_fingerprint(a))


def test_export_scan_map_column(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = (spark.range(200).select(
        F.col("id").alias("v"),
        F.when(F.col("id") % 7 == 0, None).otherwise(
            F.create_map(F.lit("k"), F.col("id").cast("string"),
                         F.concat(F.lit("x"), F.col("id")), F.lit("y")))
        .alias("m")))
    dst = str(tmp_path / "maps")
    export_parquet(df.repartition(2), dst).collect()
    a = df.select("v", F.map_keys("m").alias("k"),
                  F.map_values("m").alias("w"))
    for back in (spark.read.parquet(dst), scan_parquet(spark, dst)):
        b = back.select("v", F.map_keys("m").alias("k"),
                        F.map_values("m").alias("w"))
        assert tuple(_fingerprint(b)) == tuple(_fingerprint(a))
