"""Parquet BloomFilter sidecar conformance (parquet.thrift
BloomFilterHeader / BLOCK split-block algorithm / XXHASH).

Both directions against parquet-java, the strongest bloom-aware
implementation in the sandbox (pyarrow 16 and DuckDB 1.0 expose
neither leg): Spark-written blooms must answer membership through OUR
reader (validates the XXH64 kernel, the header parse, and the SBBF
block/salt layout bit-for-bit), and OUR writer's sidecars must answer
membership through parquet-java's own BlockSplitBloomFilter via
ParquetFileReader.readBloomFilter. The scan_parquet eq_prune leg pins
row-group point-pruning end to end."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from cpp_parquet_spark import interop
from cpp_parquet_spark.codecs import xxh

np.seterr(over="ignore")


def test_xxh64_matches_spark_jvm(spark):
    # Spark SQL's xxhash64(binary) is XXH64 seed 42 over the raw bytes:
    # the JVM is the reference implementation for our numpy kernel
    import random

    import pyspark.sql.functions as F
    random.seed(11)
    vals = [os.urandom(random.randint(0, 100)) for _ in range(300)] + \
        [b"", b"a", b"abcdefgh", os.urandom(31), os.urandom(32),
         os.urandom(33), os.urandom(64), os.urandom(1000)]
    ours = xxh.xxh64(vals, seed=42).astype(np.int64)
    df = spark.createDataFrame([(bytearray(v),) for v in vals],
                               "b binary")
    theirs = [r[0] for r in df.select(F.xxhash64("b")).collect()]
    assert [int(x) for x in ours] == theirs


def test_our_reader_on_spark_written_bloom(spark, tmp_path):
    import pyspark.sql.functions as F
    dst = str(tmp_path / "sbloom")
    present = [(i * 7919) % 99991 for i in range(10000)]
    (spark.createDataFrame([(v,) for v in present], "v long")
     .coalesce(1).write
     .option("parquet.bloom.filter.enabled#v", "true")
     .option("parquet.bloom.filter.expected.ndv#v", "20000")
     .parquet(dst))
    f = glob.glob(dst + "/*.parquet")[0]
    vals = np.array(sorted(set(present)), np.int64)
    assert interop.bloom_might_contain(f, "v", vals).all()
    absent = np.arange(200000, 240000, dtype=np.int64)
    assert interop.bloom_might_contain(f, "v", absent).mean() < 0.02


def test_parquet_java_reads_our_bloom(spark, tmp_path):
    # py4j passes ints <= 2^31 as java int (wrong hash overload), so
    # the probe values sit above 2^33
    base = 1 << 33
    p = str(tmp_path / "ours64.parquet")
    vals = [base + (i * 7919) % 99991 for i in range(20000)]
    strs = [f"repo_{(i * 31) % 5000}" for i in range(20000)]
    interop.write_parquet(p, {"v": pa.array(vals, pa.int64()),
                              "s": pa.array(strs, pa.string())},
                          bloom={"v", "s"}, statistics=True)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path("file://" + p)
    inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile \
        .fromPath(path, conf)
    rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
    rg = rdr.getRowGroups().get(0)
    try:
        for ci in range(2):
            cc = rg.getColumns().get(ci)
            name = cc.getPath().toDotString()
            bf = rdr.readBloomFilter(cc)
            assert bf is not None
            if name == "v":
                hits = sum(1 for x in sorted(set(vals))[:500]
                           if bf.findHash(bf.hash(x)))
                fps = sum(1 for x in range(base + 10**6,
                                           base + 10**6 + 500)
                          if bf.findHash(bf.hash(x)))
            else:
                Binary = jvm.org.apache.parquet.io.api.Binary
                hits = sum(1 for i in range(500) if bf.findHash(
                    bf.hash(Binary.fromString(f"repo_{i}"))))
                fps = sum(1 for i in range(500) if bf.findHash(
                    bf.hash(Binary.fromString(f"nope_{i}"))))
            assert hits == 500, name
            assert fps < 25, name
    finally:
        rdr.close()


def test_our_bloom_roundtrip_multi_rg(tmp_path):
    p = str(tmp_path / "ours_rg.parquet")
    n = 9000
    v = pa.array([(i * 104729) % (1 << 40) for i in range(n)],
                 pa.int64())
    interop.write_parquet(p, {"v": v}, bloom={"v"}, row_group_rows=3000,
                          statistics=True)
    blooms = interop.read_bloom_filter(p, "v")
    assert len(blooms) == 3
    present = np.array(sorted(set(v.to_pylist())), np.int64)
    assert interop.bloom_might_contain(p, "v", present).all()
    absent = np.arange(10**13, 10**13 + 20000, dtype=np.int64)
    assert interop.bloom_might_contain(p, "v", absent).mean() < 0.05
    # per-row-group point lookup: a value from rg 0 only
    surv = interop.bloom_rg_survivors(p, "v", int(present[0]))
    assert surv[0] is True
    assert sum(surv.values()) <= 2        # other rgs: absent (mod FPs)


def test_bloom_rejects_nested_and_missing(tmp_path):
    arr = pa.array([[1, 2]], pa.list_(pa.int64()))
    with pytest.raises(ValueError, match="flat-leaf"):
        interop.write_parquet(str(tmp_path / "x.parquet"),
                              {"a": arr}, bloom={"a"})
    with pytest.raises(ValueError, match="not in columns"):
        interop.write_parquet(str(tmp_path / "y.parquet"),
                              {"a": pa.array([1], pa.int64())},
                              bloom={"zzz"})


def test_scan_parquet_eq_prune_uses_bloom(spark, tmp_path):
    # keys are scattered mod a large prime, so every row group's
    # min/max window covers the whole domain and stats CANNOT prune —
    # only the bloom can drop row groups for a point lookup
    import pyspark.sql.functions as F

    from cpp_parquet_spark.export import export_parquet, scan_parquet
    df = spark.range(40000).select(
        ((F.col("id") * 104729) % 999983).alias("k"),
        F.col("id").alias("payload"))
    dst = str(tmp_path / "needle")
    export_parquet(df.repartition(4), dst, row_group_rows=2500,
                   bloom={"k"}).collect()
    needle = int(df.filter("id = 31337").select("k").collect()[0][0])
    hit = scan_parquet(spark, dst, eq_prune=("k", needle))
    n_tasks = hit.rdd.getNumPartitions()
    assert n_tasks <= 4                  # 16 row groups -> a handful
    got = hit.filter(F.col("k") == needle).select("payload").collect()
    assert sorted(r[0] for r in got) == [31337]
    # absent needle: every row group provably dropped (or a rare FP)
    miss = scan_parquet(spark, dst, eq_prune=("k", 10**12 + 7))
    assert miss.count() == 0
