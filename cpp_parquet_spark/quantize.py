"""Embedding quantization — int8 scalar quantization of array<float>
columns for the similarity-search memory path.

At 100 TB an fp32 embedding corpus is the ANN working set; symmetric
per-vector int8 quantization cuts it 4x (plus one fp32 scale per vector)
with bounded reconstruction error, which is what keeps IVF/LSH candidate
scans memory-bandwidth-feasible at scale. The reference
(Apsalar/cpp-parquet) has no analogue — this is a training-data-pipeline
extension mandated by the task brief, same family as
:mod:`cpp_parquet_spark.similarity`.

Everything here is Spark built-in expressions (transform / aggregate /
zip_with) — no Python UDF, so the plan is whole-stage-codegen'd and the
arithmetic is plain IEEE float64, reproducible bit-for-bit by the DuckDB
oracle (list_transform / list_aggregate on the same formulas).

Rounding is ``floor(x + 0.5)`` rather than ``round()`` because Spark and
DuckDB disagree on round-half semantics for doubles; floor(+0.5) is
identical IEEE arithmetic in both engines. scale = amax/127 guarantees
|v|/scale <= 127 + ulp, and floor(x+0.5) can only reach 128 if
x >= 127.5, which a sub-ulp overshoot cannot produce — so no clipping
branch is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_Q = 127.0


def _scale(vec_col: str):
    """Per-vector symmetric scale: max(|v_i|) / 127 (0-vectors -> scale 0)."""
    amax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    return amax / F.lit(_Q)


def _qexpr(vec_col: str, scale_col: str):
    """array<int> of floor(v/scale + 0.5); all-zero when scale == 0."""
    return F.when(F.col(scale_col) == 0.0,
                  F.transform(F.col(vec_col), lambda x: F.lit(0))) \
            .otherwise(F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") / F.col(scale_col)
                                  + F.lit(0.5)).cast("int")))


def quantize(emb: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """(id, scale, qvec): symmetric per-vector int8-range quantization.

    qvec values are in [-127, 127]; dequantization is ``q * scale``.
    One narrow projection — no shuffle, no UDF; at scale this runs inside
    the scan's whole-stage-codegen pass.
    """
    return (emb
            .withColumn("scale", _scale(vec_col))
            .select(F.col(id_col).alias("id"),
                    F.col("scale"),
                    _qexpr(vec_col, "scale").alias("qvec")))


def quantize_stats(emb: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Per-vector quantization summary, list-free for oracle hashing:
    (id, dim, scale, q_sum, q_min, q_max)."""
    q = quantize(emb, id_col, vec_col)
    return q.select(
        "id",
        F.size("qvec").alias("dim"),
        F.round("scale", 9).alias("scale"),
        F.aggregate("qvec", F.lit(0).cast("long"),
                    lambda a, x: a + x.cast("long")).alias("q_sum"),
        F.array_min("qvec").alias("q_min"),
        F.array_max("qvec").alias("q_max"),
    ).orderBy("id")


def quantize_error(emb: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Reconstruction-quality metrics per vector:
    (id, max_abs_err, cos_sim) between v and dequant(quantize(v)).

    max_abs_err is bounded by scale/2 = max|v|/254 by construction; the
    query proves the bound holds on real data (and the oracle recomputes
    it independently)."""
    d = (emb.withColumn("scale", _scale(vec_col))
            .withColumn("qvec", _qexpr(vec_col, "scale"))
            .withColumn("deq", F.transform(
                "qvec", lambda q: q.cast("double") * F.col("scale"))))
    verr = F.zip_with(F.col(vec_col), "deq",
                      lambda a, b: F.abs(a.cast("double") - b))
    dot = F.zip_with(F.col(vec_col), "deq",
                     lambda a, b: a.cast("double") * b)
    sq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x * x)
    ssum = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x)
    vnorm = F.sqrt(sq(F.transform(F.col(vec_col),
                                  lambda x: x.cast("double"))))
    dnorm = F.sqrt(sq(F.col("deq")))
    return (d.select(
        F.col(id_col).alias("id"),
        F.round(F.aggregate(verr, F.lit(0.0),
                            lambda acc, x: F.greatest(acc, x)), 9)
         .alias("max_abs_err"),
        F.round(F.when(vnorm * dnorm == 0.0, F.lit(1.0))
                 .otherwise(ssum(dot) / (vnorm * dnorm)), 6)
         .alias("cos_sim"))
        .orderBy("id"))
