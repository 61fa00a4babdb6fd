"""Map / struct columns via flatten-compose-unflatten
(cpp_parquet_spark.nested; VERDICT r3 Missing #4).

The engine's page format deliberately stops at one list level; nested
columns flatten to leaf columns the existing codec families handle
bit-exactly (struct -> leaf cols + a struct-null bool; map -> aligned
keys/vals list columns), and unflatten reassembles them after decode.
"""
import pytest
from pyspark.sql import Row, functions as F, types as T

from cpp_parquet_spark import nested
from cpp_parquet_spark.engine import encode_table
from cpp_parquet_spark.partitioning import EncodeConfig


def _cfg(name: str, parts: int = 4) -> EncodeConfig:
    return EncodeConfig(keys=("id",), salt_from=(), num_parts=parts,
                        order_keys=("id",), table_name=name)


def _comparable(df):
    """Spark set ops refuse MapType columns; canonicalize maps (and any
    map nested in a struct) to sorted-entries text for the compare."""
    def canon(c, dt):
        if isinstance(dt, T.MapType):
            return F.to_json(F.sort_array(F.map_entries(c)))
        if isinstance(dt, T.StructType):
            return F.struct(*[canon(c[f.name], f.dataType).alias(f.name)
                              for f in dt.fields])
        return c
    return df.select(*[canon(F.col(f.name), f.dataType).alias(f.name)
                       for f in df.schema.fields])


def _rt(spark, df, name: str):
    pages, spec = nested.encode_nested(df, _cfg(name))
    # spec survives JSON (lineage storage contract)
    spec = nested.spec_from_json(nested.spec_json(spec))
    back = nested.decode_nested(pages, spec, spark)
    assert back.columns == df.columns
    # decoded columns are always nullable, so compare types not flags
    assert back.schema.simpleString() == df.schema.simpleString()
    a, b = _comparable(df), _comparable(back)
    assert b.exceptAll(a).count() == 0
    assert a.exceptAll(b).count() == 0
    return pages


def test_map_string_string_roundtrip(spark):
    df = (spark.range(0, 2000).withColumnRenamed("id", "id")
          .withColumn("m", F.when(
              F.col("id") % 7 == 0, F.lit(None).cast("map<string,string>"))
              .when(F.col("id") % 5 == 0,
                    F.expr("map()"))          # empty map != null map
              .otherwise(F.expr(
                  "map('k1', CAST(id AS STRING), 'k2', "
                  "repeat('v', CAST(id % 9 AS INT)))"))))
    pages = _rt(spark, df, "m1")
    # the map rode the lists codec as two aligned array<string> columns
    types = {r["column"]: r["type"]
             for r in pages.filter("col_idx >= 0")
             .select("column", "type").distinct().collect()}
    assert types["m#keys"] == "arrs" and types["m#vals"] == "arrs"


def test_map_string_int_uses_listi(spark):
    df = (spark.range(0, 1000)
          .withColumn("m", F.expr(
              "map('a', id, 'b', id * 2, 'c', -id)")))
    pages = _rt(spark, df, "m2")
    types = {r["column"]: r["type"]
             for r in pages.filter("col_idx >= 0")
             .select("column", "type").distinct().collect()}
    assert types["m#vals"] == "arri64"        # ints ride listi, not text


def test_struct_roundtrip_incl_struct_null(spark):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("st", T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ])),
    ])
    rows = []
    for i in range(1000):
        if i % 7 == 0:
            rows.append((i, None))                   # struct itself NULL
        elif i % 5 == 0:
            rows.append((i, (None, None)))           # all fields null
        else:
            rows.append((i, (i * 3, f"s{i}")))
    df = spark.createDataFrame(rows, schema)
    _rt(spark, df, "st1")


def test_nested_struct_and_map_inside_struct(spark):
    df = (spark.range(0, 500)
          .withColumn("st", F.struct(
              F.struct((F.col("id") * 2).alias("x")).alias("inner"),
              F.expr("map('k', CAST(id AS STRING))").alias("m"),
              F.col("id").cast("double").alias("d"))))
    _rt(spark, df, "st2")


def test_flatten_rejects_the_unflattenable(spark):
    df = spark.range(0, 10).withColumn(
        "am", F.array(F.expr("map('k', id)")))       # array<map<...>>
    with pytest.raises(ValueError):
        nested.flatten(df)
    df2 = spark.range(0, 10).withColumn(
        "mm", F.expr("map('k', map('x', id))"))      # map value = map
    with pytest.raises(ValueError, match="non-scalar"):
        nested.flatten(df2)


def test_flatten_collision_guard(spark):
    df = (spark.range(0, 10)
          .withColumn("m", F.expr("map('k', id)"))
          .withColumn("m#keys", F.lit("clash")))
    with pytest.raises(ValueError, match="collides"):
        nested.flatten(df)


def test_flatten_is_pure_codegen(spark):
    """No Python in the flatten path: the plan is a single Project over
    the scan (whole-stage codegen), no UDF/Arrow eval nodes."""
    df = (spark.range(0, 100)
          .withColumn("m", F.expr("map('k', CAST(id AS STRING))"))
          .withColumn("st", F.struct(F.col("id").alias("a"))))
    flat, _ = nested.flatten(df)
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Eval" not in plan and "Python" not in plan, plan


def test_array_of_struct_roundtrip(spark):
    # array<struct<scalars>> -> aligned per-field list columns + an
    # array<tinyint> element-null marker; the common real-world schema
    # (event props, tool calls). NULL list / empty list / NULL element /
    # NULL field must all survive bit-exactly.
    df = spark.range(0, 300).select(
        F.col("id"),
        F.expr("""CASE WHEN id % 11 = 0 THEN NULL
                  WHEN id % 9 = 0 THEN array()
                  ELSE transform(sequence(0, CAST(id % 4 AS INT)),
                       i -> CASE WHEN (id + i) % 6 = 0 THEN NULL
                            ELSE named_struct(
                                 'u', id * 10 + i,
                                 'v', CASE WHEN (id + i) % 5 = 0 THEN NULL
                                      ELSE concat('s', id, '_', i) END,
                                 'w', CAST(id AS DOUBLE) / (i + 1))
                            END)
                  END""").alias("evs"))
    flat, spec = nested.flatten(df)
    assert sorted(c for c in flat.columns if c != "id") == \
        ["evs#enull", "evs#u", "evs#v", "evs#w"]
    _rt(spark, df, "arrstruct")


def test_array_of_struct_rejects_deeper(spark):
    # struct-in-struct inside a list still has no aligned-list form
    df = spark.range(0, 5).select(
        F.col("id"),
        F.array(F.struct(F.struct(F.col("id").alias("x")).alias("in_"))
                ).alias("a"))
    with pytest.raises(ValueError, match="aligned-list"):
        nested.flatten(df)


def test_array_of_struct_flatten_is_pure_codegen(spark):
    df = spark.range(0, 50).select(
        F.col("id"),
        F.array(F.struct(F.col("id").alias("u"),
                         (F.col("id") * 2.0).alias("v"))).alias("a"))
    flat, _ = nested.flatten(df)
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Eval" not in plan and "Python" not in plan, plan
