"""DateType / DecimalType tags (VERDICT r2 item 5): date = epoch-days
int32 via the int codec family; decimal(p<=18, s) = unscaled int64 with
precision/scale carried in the parameterized ``dec:<p>:<s>`` tag."""
import datetime
import decimal

import numpy as np
import pyarrow as pa
import pytest

from cpp_parquet_spark.codecs import pagecodec


DATES = [datetime.date(1970, 1, 1), datetime.date(2026, 8, 18),
         datetime.date(1, 1, 1), datetime.date(9999, 12, 31),
         datetime.date(1969, 12, 31), None, datetime.date(2000, 2, 29)]

DECS = [decimal.Decimal("0.00"), decimal.Decimal("12345.67"),
        decimal.Decimal("-99999999999999.99"),     # -(10^16-1) unscaled
        decimal.Decimal("99999999999999.99"),
        None, decimal.Decimal("-0.01")]


@pytest.mark.parametrize("codec", ["plain", "for", "delta", "rle", "dict"])
def test_date_page_roundtrip(codec):
    arr = pa.array(DATES, pa.date32())
    row = pagecodec.encode_page(arr, "date", codec)
    got = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                "date", row["num_values"], row["null_count"])
    assert got.cast(pa.date32()).to_pylist() == DATES


@pytest.mark.parametrize("codec", ["plain", "for", "delta", "rle", "dict"])
def test_decimal_page_roundtrip(codec):
    tag = "dec:16:2"
    arr = pa.array(DECS, pa.decimal128(16, 2))
    row = pagecodec.encode_page(arr, tag, codec)
    got = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                tag, row["num_values"], row["null_count"])
    assert got.type == pa.decimal128(16, 2)
    assert got.to_pylist() == DECS


def test_decimal_unscaled_extremes():
    """p=18 extremes: +/-(10^18 - 1) must survive bit-exact."""
    tag = "dec:18:4"
    lo = -(10 ** 18 - 1)
    hi = 10 ** 18 - 1
    vals = [decimal.Decimal(v).scaleb(-4)
            for v in (lo, hi, 0, 1, -1, 10 ** 17)]
    arr = pa.array(vals, pa.decimal128(18, 4))
    for codec in ("plain", "for", "delta"):
        row = pagecodec.encode_page(arr, tag, codec)
        got = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                    tag, row["num_values"], row["null_count"])
        assert got.to_pylist() == vals, codec
    # the unscaled view really is the low word
    assert pagecodec.dec_unscaled(arr)[0] == lo
    assert pagecodec.dec_unscaled(arr)[1] == hi


def test_dec_unscaled_respects_offset():
    arr = pa.array([decimal.Decimal("1.1"), decimal.Decimal("2.2"),
                    decimal.Decimal("-3.3")], pa.decimal128(10, 1))
    assert pagecodec.dec_unscaled(arr.slice(1)).tolist() == [22, -33]


def test_spark_type_tag_mapping():
    from pyspark.sql import types as T
    assert pagecodec.spark_type_tag(T.DateType()) == "date"
    assert pagecodec.spark_type_tag(T.DecimalType(12, 2)) == "dec:12:2"
    # > int64 unscaled: wide-decimal passthrough tag (round 4)
    assert pagecodec.spark_type_tag(T.DecimalType(38, 10)) == "dec38:38:10"
    assert pagecodec.spark_type_for("date") == T.DateType()
    assert pagecodec.spark_type_for("dec:12:2") == T.DecimalType(12, 2)
    assert pagecodec.legal_codecs("dec:12:2") == pagecodec.LEGAL["i64"]


def test_date_decimal_engine_roundtrip(spark, tmp_path):
    """Full pipeline: Spark df with date + decimal columns -> encode ->
    decode -> exact row multiset equality; zone pushdown on the date."""
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import (decode_table, decode_where,
                                          encode_table, verify_roundtrip)
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = (spark.range(0, 5000)
          .select(F.col("id"),
                  F.date_add(F.lit("2020-01-01"),
                             (F.col("id") % 1000).cast("int")).alias("d"),
                  F.expr("CAST(id * 1.11 AS DECIMAL(14,2))").alias("price"))
          .withColumn("d", F.when(F.col("id") % 97 == 0, None)
                      .otherwise(F.col("d")))
          .withColumn("price", F.when(F.col("id") % 89 == 0, None)
                      .otherwise(F.col("price"))))
    cfg = EncodeConfig(keys=("id",), salt_from=(), num_parts=8,
                       order_keys=("id",), table_name="dd")
    pages = encode_table(df, cfg)
    dec = decode_table(pages, spark)
    assert dec.schema["d"].dataType.typeName() == "date"
    assert dec.schema["price"].dataType.simpleString() == "decimal(14,2)"
    assert dec.exceptAll(df).count() == 0
    assert df.exceptAll(dec).count() == 0
    # date zone pushdown: epoch-days domain
    lo = (datetime.date(2020, 6, 1) - datetime.date(1970, 1, 1)).days
    hi = (datetime.date(2020, 6, 30) - datetime.date(1970, 1, 1)).days
    got = decode_where(pages, "d", lo=lo, hi=hi, spark=spark)
    want = df.filter((F.col("d") >= F.lit("2020-06-01"))
                     & (F.col("d") <= F.lit("2020-06-30")))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
