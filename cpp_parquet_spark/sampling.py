"""Deterministic sampling for training-data pipelines: domain mixing
and holdout splits keyed on a hash of the row id — no RNG, no
partition-order dependence, so results are bit-stable across resume,
recluster, and cluster size (the property Spark's ``sample()`` cannot
give you: its per-partition RNG re-salts when partitioning changes).

The uniform variate is the first 32 bits of md5 of the DECIMAL id
string — the engine's established cross-engine recipe (the SimHash
oracle recomputes the same md5 in DuckDB bit-identically), so every
sampler here carries a full SQL oracle.

At 100 TB each op is one codegen filter on the scan — no shuffle, no
driver traffic; rates/fractions fold into the plan as literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_uniform(id_col: str = "doc_id") -> Column:
    """U[0,1) from md5(id) — deterministic per id, independent of
    partitioning. 32 bits of resolution: rate granularity 2^-32."""
    return (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                   16, 10).cast("double") / F.lit(float(1 << 32)))


def sample_domains(df: DataFrame, rates: dict[str, float],
                   default_rate: float = 1.0,
                   domain_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Domain-mixing downsampler: keep each row iff
    hash_uniform(id) < rate[domain] (``default_rate`` for unlisted
    domains). The way training mixes are actually built: per-source
    retention rates tuned to hit target token proportions, reproducible
    run over run so downstream dedup/packing see a stable corpus."""
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
        rate = F.when(F.col(domain_col) == F.lit(k),
                      F.lit(float(v))).otherwise(rate)
    return df.filter(hash_uniform(id_col) < rate)


def split_holdout(df: DataFrame, eval_frac: float = 0.01,
                  id_col: str = "doc_id",
                  split_col: str = "split") -> DataFrame:
    """Deterministic train/eval split: rows with
    hash_uniform(id) < eval_frac are 'eval', the rest 'train'. A row's
    assignment never changes as the corpus grows — append-only
    pipelines keep a consistent holdout without re-sharding."""
    if not (0.0 <= eval_frac <= 1.0):
        raise ValueError(f"eval_frac must be in [0, 1], got {eval_frac}")
    return df.withColumn(
        split_col,
        F.when(hash_uniform(id_col) < F.lit(float(eval_frac)),
               F.lit("eval")).otherwise(F.lit("train")))


def upsample_domains(df: DataFrame, weights: dict[str, float],
                     default_weight: float = 1.0,
                     domain_col: str = "source",
                     id_col: str = "doc_id",
                     epoch_col: str = "epoch") -> DataFrame:
    """The other half of mix construction: repeat factors ≥ 0 (weights
    > 1 UPsample). A row with weight w gets ``floor(w)`` copies plus one
    more iff a salted md5-uniform < frac(w), so expected multiplicity is
    exactly w and the copy set is deterministic per id (append/resume
    stable). Copies are numbered 1..k in ``epoch_col`` so downstream
    packing can interleave epochs rather than emit k adjacent clones.

    Scale shape: one codegen ``explode(sequence(1, k))`` on the scan —
    no shuffle, no RNG, no driver traffic. The salt keeps the fractional
    coin independent of :func:`sample_domains`'s keep coin, so chaining
    down- then up-sampling doesn't correlate."""
    frac_u = (F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":up"))), 1, 8),
        16, 10).cast("double") / F.lit(float(1 << 32)))
    w = F.lit(float(default_weight))
    for k, v in sorted(weights.items()):
        if not (0.0 <= v):
            raise ValueError(f"weight for {k!r} must be >= 0, got {v}")
        w = F.when(F.col(domain_col) == F.lit(k), F.lit(float(v))).otherwise(w)
    n = (F.floor(w) + F.when(frac_u < w - F.floor(w), F.lit(1))
         .otherwise(F.lit(0))).cast("int")
    # sequence(1, 0) is DESCENDING [1, 0] in Spark (step inferred -1),
    # so k = 0 must map to an explicit empty array, not sequence(1, 0).
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)) \
              .otherwise(F.array().cast("array<int>"))
    return df.withColumn(epoch_col, F.explode(copies))


def shuffle_order(df: DataFrame, id_col: str = "doc_id",
                  key_col: str = "shuffle_key",
                  partitions: int | None = None) -> DataFrame:
    """Deterministic global corpus shuffle: md5(id) as a stable
    pseudo-random sort key, so training examples are well mixed across
    sources/time yet the order reproduces bit-identically run over run
    (a seeded `orderBy(rand())` changes with partitioning; this never
    does).

    Scale shape: ``repartitionByRange`` on the key + in-partition sort —
    a range exchange (sampled bounds) instead of a single-task global
    sort; output files concatenate to the total order. One shuffle,
    unavoidable for a global reorder."""
    out = df.withColumn(key_col, F.md5(F.col(id_col).cast("string")))
    n = int(partitions) if partitions else \
        out.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, F.col(key_col)) \
              .sortWithinPartitions(key_col)
