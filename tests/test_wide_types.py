"""Round-4 type-matrix closure (VERDICT r3 items 2 and 6):

- ``dec38:<p>:<s>``: DecimalType(18 < p <= 38) PLAIN passthrough —
  16-byte LE decimal128 words (the LE twin of Parquet's
  FIXED_LEN_BYTE_ARRAY(16) DECIMAL convention).
- ``i8``/``i16``: ByteType/ShortType scalars through the int codec
  family, decoded back to the exact Spark type.
- Fail-loud encode front door: unsupported column types raise unless
  explicitly allowlisted via ``ignore_columns`` — no silent drops.
- upsert batch-size cap and asof_join empty-``by`` guard.
"""
import decimal

import numpy as np
import pyarrow as pa
import pytest

from cpp_parquet_spark.codecs import pagecodec

D = decimal.Decimal
WIDE = [D("99999999999999999999999999999999.999999"),      # 38 digits
        D("-99999999999999999999999999999999.999999"),
        D("0.000000"), None, D("12345678901234567890.000001"),
        D("-0.000001"), None]


def test_dec38_page_roundtrip():
    tag = "dec38:38:6"
    arr = pa.array(WIDE, pa.decimal128(38, 6))
    row = pagecodec.encode_page(arr, tag, "plain")
    assert row["raw_bytes"] == 16 * (len(WIDE) - 2)
    got = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                tag, row["num_values"], row["null_count"])
    assert got.type == pa.decimal128(38, 6)
    assert got.to_pylist() == WIDE


def test_dec38_block_codec_roundtrip():
    """The E9 outer block codec still wraps the passthrough page."""
    tag = "dec38:20:0"
    vals = [D(10**19 + i) for i in range(4096)]
    arr = pa.array(vals, pa.decimal128(20, 0))
    row = pagecodec.encode_page(arr, tag, "plain", block="zstd")
    assert row["enc_bytes"] < 16 * len(vals)    # zstd actually shrank it
    got = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                tag, row["num_values"], row["null_count"])
    assert got.to_pylist() == vals


def test_dec38_offset_slice():
    """encode_dec128 must honour the arrow slice offset."""
    arr = pa.array([D(10**20), D(2 * 10**20), D(3 * 10**20)],
                   pa.decimal128(38, 0))
    row = pagecodec.encode_page(arr.slice(1), "dec38:38:0", "plain")
    got = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                "dec38:38:0", row["num_values"],
                                row["null_count"])
    assert got.to_pylist() == [D(2 * 10**20), D(3 * 10**20)]


def test_dec38_tag_plumbing():
    from pyspark.sql import types as T
    assert pagecodec.spark_type_tag(T.DecimalType(38, 6)) == "dec38:38:6"
    assert pagecodec.spark_type_tag(T.DecimalType(19, 0)) == "dec38:19:0"
    assert pagecodec.spark_type_for("dec38:38:6") == T.DecimalType(38, 6)
    assert pagecodec.legal_codecs("dec38:38:6") == ("plain",)
    assert pagecodec.arrow_type_for("dec38:38:6") == pa.decimal128(38, 6)
    assert not pagecodec.is_dec("dec38:38:6")   # families stay disjoint
    assert pagecodec.is_dec38("dec38:38:6")
    assert not pagecodec.is_dec38("dec:12:2")


@pytest.mark.parametrize("tag,lo,hi", [("i8", -128, 127),
                                       ("i16", -32768, 32767)])
@pytest.mark.parametrize("codec", ["plain", "for", "delta", "rle",
                                   "dict", "bitpack"])
def test_narrow_int_page_roundtrip(tag, lo, hi, codec):
    np_t = np.int8 if tag == "i8" else np.int16
    vals = list(np.arange(lo, hi + 1, max(1, (hi - lo) // 500),
                          dtype=np_t)) + [None, np_t(0), None]
    arr = pa.array(vals, pagecodec.ARROW_TYPE[tag])
    row = pagecodec.encode_page(arr, tag, codec)
    got = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                tag, row["num_values"], row["null_count"])
    assert got.type == pagecodec.ARROW_TYPE[tag]
    assert got.to_pylist() == arr.to_pylist()


def test_narrow_int_plain_width():
    """PLAIN i8 stores 1 byte/value — the selector's baseline must agree
    (an 8x-inflated baseline would push every i8 page into FOR)."""
    arr = pa.array(list(range(-128, 128)), pa.int8())
    row = pagecodec.encode_page(arr, "i8", "plain")
    assert row["enc_bytes"] == 4 + 256          # u32 def_len header + data
    assert row["raw_bytes"] == 256


def test_encode_fails_loudly_on_unsupported(spark):
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import encodable_columns, encode_table
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = (spark.range(0, 10)
          .withColumn("m", F.create_map(F.lit("k"), F.col("id")))
          .withColumn("st", F.struct(F.col("id").alias("a")))
          .withColumn("nested", F.array(F.array(F.lit(1)))))
    cfg = EncodeConfig(keys=("id",), salt_from=(), num_parts=2,
                       table_name="bad")
    with pytest.raises(ValueError) as ei:
        encode_table(df, cfg)
    msg = str(ei.value)
    # every offender named, with its type
    assert "m (map<string,bigint>)" in msg
    assert "st (struct<a:bigint>)" in msg
    assert "nested (array<array<int>>)" in msg
    assert "ignore_columns" in msg
    # explicit allowlist drops them and proceeds
    cols, tags = encodable_columns(df, ignore_columns=["m", "st", "nested"])
    assert cols == ["id"] and tags == ["i64"]
    pages = encode_table(df, cfg, ignore_columns=["m", "st", "nested"])
    assert pages.filter("col_idx >= 0").count() > 0


def test_wide_types_engine_roundtrip(spark):
    """Full pipeline for decimal(38,6) + tinyint + smallint incl. nulls."""
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import decode_table, encode_table
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = (spark.range(0, 4000)
          .select(F.col("id"),
                  F.expr("CAST(CAST(id AS DECIMAL(38,6)) * "
                         "CAST(1000000000000000 AS DECIMAL(16,0)) "
                         "AS DECIMAL(38,6))").alias("wide"),
                  (F.col("id") % 256 - 128).cast("tinyint").alias("b"),
                  (F.col("id") * 13 % 65536 - 32768)
                  .cast("smallint").alias("s"))
          .withColumn("wide", F.when(F.col("id") % 11 == 0, None)
                      .otherwise(F.col("wide")))
          .withColumn("b", F.when(F.col("id") % 13 == 0, None)
                      .otherwise(F.col("b"))))
    cfg = EncodeConfig(keys=("id",), salt_from=(), num_parts=4,
                       order_keys=("id",), table_name="wt")
    dec = decode_table(encode_table(df, cfg), spark)
    assert dec.schema["wide"].dataType.simpleString() == "decimal(38,6)"
    assert dec.schema["b"].dataType.typeName() == "byte"
    assert dec.schema["s"].dataType.typeName() == "short"
    assert dec.exceptAll(df).count() == 0
    assert df.exceptAll(dec).count() == 0


def test_upsert_batch_cap(spark, tmp_path, monkeypatch):
    from cpp_parquet_spark import engine
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.range(0, 50).withColumnRenamed("id", "k")
    cfg = EncodeConfig(keys=("k",), salt_from=(), num_parts=2,
                       table_name="up")
    dst = str(tmp_path / "up")
    engine.run_encode(spark, df, dst, cfg)
    monkeypatch.setattr(engine, "_MAX_LITERAL_PRUNE", 10)
    with pytest.raises(ValueError, match="distinct 'k' values"):
        engine.upsert(spark, df, dst, cfg, key="k")
    # small batch still flows: 5 keys replaced, table still 50 live rows
    out = engine.upsert(spark, df.limit(5), dst, cfg, key="k")
    assert out["rows_replaced"] == 5
    live = engine.decode_dataset(spark, dst)
    assert live.count() == 50
    assert live.select("k").distinct().count() == 50


def test_asof_join_empty_by_raises(spark):
    from cpp_parquet_spark.joins import asof_join
    df = spark.range(0, 10).withColumnRenamed("id", "t")
    with pytest.raises(ValueError, match="single-partition"):
        asof_join(df, df.withColumn("v", df["t"] * 2), on="t")
