"""Spark Python DataSource front door (`format("cpp_parquet")`).

The idiomatic read/write API over files from OUR emitters, decoded by
OUR kernels — with Catalyst's pushed filters turned into row-group
pruning (Statistics windows + SBBF blooms) before any data task runs."""

import glob
import os

import pyspark.sql.functions as F
import pytest

from cpp_parquet_spark.datasource import (CppParquetDataSource,
                                          CppParquetReader)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(CppParquetDataSource)
    return spark


def _write(spark, dst, n=20000):
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 104729) % 999983).alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 97)).alias("s"))
    (df.repartitionByRange(4, "id").sortWithinPartitions("id")
     .write.format("cpp_parquet").mode("append")
     .option("bloom", "k").option("row_group_rows", "1000").save(dst))
    return df


def test_write_read_roundtrip(registered, tmp_path):
    spark = registered
    dst = str(tmp_path / "ds")
    df = _write(spark, dst)
    assert len(glob.glob(dst + "/*.parquet")) == 4
    back = spark.read.format("cpp_parquet").load(dst)
    assert back.schema.simpleString() == \
        "struct<id:bigint,k:bigint,s:string>"
    a = df.agg(F.count("*"), F.sum("id"), F.sum("k")).collect()[0]
    b = back.agg(F.count("*"), F.sum("id"), F.sum("k")).collect()[0]
    assert tuple(a) == tuple(b)


def test_filter_pushdown_prunes_row_groups(registered, tmp_path):
    spark = registered
    dst = str(tmp_path / "dsp")
    df = _write(spark, dst)
    back = spark.read.format("cpp_parquet").load(dst)
    # exactness through the pushed filters (Spark re-applies them)
    needle = (123 * 104729) % 999983
    assert [r.id for r in
            back.filter(F.col("k") == needle).collect()] == [123]
    assert back.filter("id >= 19990").count() == 10
    assert back.filter(F.col("k") == 10**12 + 7).count() == 0
    # pruning evidence: drive the reader directly — the same planner
    # decisions Spark sees via partitions()
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual
    schema = back.schema
    rdr = CppParquetReader({"path": dst}, schema)
    total = len(rdr.partitions())
    assert total >= 20                      # 4 files x ~5 row groups
    rdr2 = CppParquetReader({"path": dst}, schema)
    list(rdr2.pushFilters([EqualTo(("k",), needle)]))
    pruned = len(rdr2.partitions())
    assert pruned <= max(total // 8, 2)     # bloom point-prune bites
    rdr3 = CppParquetReader({"path": dst}, schema)
    kept = list(rdr3.pushFilters([GreaterThanOrEqual(("id",), 19000)]))
    assert len(kept) == 1                   # every filter handed back
    assert len(rdr3.partitions()) < total // 2


def test_overwrite_and_append_modes(registered, tmp_path):
    spark = registered
    dst = str(tmp_path / "dsm")
    _write(spark, dst, n=1000)
    spark.range(5).select(F.col("id")).repartition(1) \
        .write.format("cpp_parquet").mode("overwrite").save(dst)
    assert spark.read.format("cpp_parquet").load(dst).count() == 5
    spark.range(7).select(F.col("id") + 100).toDF("id").repartition(1) \
        .write.format("cpp_parquet").mode("append").save(dst)
    assert spark.read.format("cpp_parquet").load(dst).count() == 12


def test_columns_option_projection(registered, tmp_path):
    spark = registered
    dst = str(tmp_path / "dsc")
    df = _write(spark, dst, n=3000)
    proj = (spark.read.format("cpp_parquet")
            .option("columns", "id,s").load(dst))
    assert proj.columns == ["id", "s"]
    assert proj.count() == 3000
    with pytest.raises(Exception, match="unknown columns"):
        (spark.read.format("cpp_parquet")
         .option("columns", "zzz").load(dst).count())


def test_unsupported_write_type_fails_loudly(registered, tmp_path):
    spark = registered
    df = spark.range(3).select(
        F.col("id"), F.expr("INTERVAL '1' DAY").alias("iv"))
    with pytest.raises(Exception, match="unsupported column types"):
        (df.write.format("cpp_parquet").mode("append")
         .save(str(tmp_path / "bad")))


def test_stream_sink_exactly_once(registered, tmp_path):
    # writeStream.format("cpp_parquet"): micro-batches land as real
    # parquet files via stage-then-move commit; a replayed batch (same
    # checkpoint, no new input) must not duplicate rows
    spark = registered
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    spark.range(0, 100).select(F.col("id"), (F.col("id") % 5).alias("k")) \
        .coalesce(1).write.parquet(in_dir)

    def run_stream():
        q = (spark.readStream.schema("id bigint, k bigint")
             .parquet(in_dir)
             .writeStream.format("cpp_parquet")
             .option("path", out).option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_stream()
    back = spark.read.format("cpp_parquet").load(out)
    assert back.count() == 100
    run_stream()                        # no new input: no duplicates
    assert spark.read.format("cpp_parquet").load(out).count() == 100
    spark.range(100, 150).select(F.col("id"),
                                 (F.col("id") % 5).alias("k")) \
        .coalesce(1).write.mode("append").parquet(in_dir)
    run_stream()
    final = spark.read.format("cpp_parquet").load(out)
    assert final.count() == 150
    assert final.agg(F.sum("id")).collect()[0][0] == sum(range(150))
    # no staged leftovers
    assert glob.glob(os.path.join(out, "_tmp", "*.parquet")) == []


def test_in_filter_bloom_pruning(registered, tmp_path):
    # IN-lists prune per VALUE through the blooms (OR semantics): two
    # needles from different row groups keep ~2 row groups, not the
    # [min, max] span between them
    spark = registered
    dst = str(tmp_path / "dsin")
    df = _write(spark, dst)
    from pyspark.sql.datasource import In
    back = spark.read.format("cpp_parquet").load(dst)
    k1 = (123 * 104729) % 999983
    k2 = (19876 * 104729) % 999983
    got = sorted(r.id for r in
                 back.filter(F.col("k").isin([k1, k2])).collect())
    assert got == [123, 19876]
    rdr = CppParquetReader({"path": dst}, back.schema)
    total = len(rdr.partitions())
    rdr2 = CppParquetReader({"path": dst}, back.schema)
    list(rdr2.pushFilters([In(("k",), (k1, k2))]))
    assert len(rdr2.partitions()) <= max(total // 4, 3)


def test_stream_source_sink_chain(registered, tmp_path):
    # readStream.format("cpp_parquet") tails the directory's
    # _commits.jsonl (append-stable offsets — uuid file names make a
    # listing unordered), chained into the format's own sink:
    # incremental, exactly-once, no reprocessing on an empty drain
    spark = registered
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    spark.range(0, 50).select(F.col("id")).repartition(2) \
        .write.format("cpp_parquet").mode("append").save(src)

    def drain():
        q = (spark.readStream.format("cpp_parquet").load(src)
             .withColumn("id2", F.col("id") * 2)
             .writeStream.format("cpp_parquet")
             .option("path", out).option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    r1 = spark.read.format("cpp_parquet").load(out) \
        .agg(F.count("*"), F.sum("id2")).collect()[0]
    assert tuple(r1) == (50, 2 * sum(range(50)))
    drain()                            # nothing new: no reprocessing
    assert spark.read.format("cpp_parquet").load(out).count() == 50
    spark.range(50, 80).select(F.col("id")).repartition(1) \
        .write.format("cpp_parquet").mode("append").save(src)
    drain()
    r3 = spark.read.format("cpp_parquet").load(out) \
        .agg(F.count("*"), F.sum("id2")).collect()[0]
    assert tuple(r3) == (80, 2 * sum(range(80)))
