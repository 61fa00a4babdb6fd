"""Similarity search over an embedding column (array<float>).

Two paths, matching what a 100 TB training-data pipeline needs:

- :func:`brute_topk` — exact cosine top-k: broadcast the (small) query
  set against the corpus, dot products in SQL higher-order functions
  (zip_with/aggregate, JVM-side), window rank per query. The baseline and
  the correctness oracle.
- :func:`lsh_topk` — the scale path: deterministic random-hyperplane LSH
  buckets (sign bits of seeded projections, computed in ONE numpy matmul
  per Arrow batch), multi-probe (flip each bit once) so a query scans
  ~(planes+1)/2**planes of the corpus instead of all of it. Same ranking
  semantics within the probed candidate set.

Recall of the LSH path vs the exact path is measured in
tests/test_pipeline_ops.py rather than asserted here — at production
scale you'd tune planes/probes per corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm_df(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (emb.select(F.col(id_col).alias("id"), v.alias("v"))
            .withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v")))))


def _partition_topk(scored: DataFrame, k: int) -> DataFrame:
    """Narrow per-partition top-k over (qid, nid, cosine) rows.

    mapInPandas with NO prior shuffle: each task folds its partition's
    scored rows into a q x k running best (numpy lexsort, comparator
    identical to the final window: cosine desc, nid asc) and emits at
    most k rows per query. The downstream global rank then shuffles only
    k * num_partitions rows per query instead of the whole corpus."""
    out_schema = T.StructType([
        T.StructField("qid", T.LongType()),
        T.StructField("nid", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def kernel(batches):
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            for qid, grp in pdf.groupby("qid"):   # loops over queries, not rows
                sc = grp["cosine"].to_numpy(dtype=np.float64)
                nid = grp["nid"].to_numpy(dtype=np.int64)
                if qid in best:
                    sc = np.concatenate((best[qid][0], sc))
                    nid = np.concatenate((best[qid][1], nid))
                if sc.shape[0] > k:
                    order = np.lexsort((nid, -sc))[:k]
                    sc, nid = sc[order], nid[order]
                best[int(qid)] = (sc, nid)
        if best:
            qids = np.concatenate([np.full(v[0].shape[0], q, dtype=np.int64)
                                   for q, v in best.items()])
            yield pd.DataFrame({
                "qid": qids,
                "nid": np.concatenate([v[1] for v in best.values()]),
                "cosine": np.concatenate([v[0] for v in best.values()]),
            })

    return scored.mapInPandas(kernel, out_schema)


def brute_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine).

    Two-phase: the query side is broadcast (the corpus never shuffles),
    each partition reduces to its local top-k (:func:`_partition_topk`),
    and only k * partitions rows per query reach the final rank window —
    the shape that survives a 100 TB corpus. Scoring arithmetic stays in
    JVM zip_with/aggregate so results are bit-stable vs the SQL oracle."""
    base = _norm_df(emb, id_col, vec_col)
    q = base.filter(F.col("id").isin(query_ids)) \
            .select(F.col("id").alias("qid"), F.col("v").alias("qv"),
                    F.col("nrm").alias("qnrm"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    scored = (base.crossJoin(F.broadcast(q))
              .filter(F.col("id") != F.col("qid"))
              .select(F.col("qid").cast("long").alias("qid"),
                      F.col("id").alias("nid"),
                      cos.alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (_partition_topk(scored, k)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", F.round("cosine", 6).alias("cosine"))
            .orderBy("qid", "rank"))


def _planes(dim: int, planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, planes))


def bucket_ids(emb: DataFrame, planes: int = 6, seed: int = 42,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int | None = None) -> DataFrame:
    """(id, bucket) via sign bits of seeded random projections.

    One numpy matmul per Arrow batch — no per-row Python."""
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
    ])
    nplanes = planes
    the_seed = seed

    def kernel(batches):
        proj = None
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy())     # (rows, dim) float32
            if proj is None:
                proj = _planes(m.shape[1], nplanes, the_seed)
            bits = (m.astype(np.float64) @ proj) > 0  # (rows, planes)
            bucket = (bits.astype(np.int64)
                      << np.arange(nplanes, dtype=np.int64)[None, :]).sum(axis=1)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(dtype=np.int64),
                                "bucket": bucket.astype(np.int32)})

    return emb.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             planes: int = 6, seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: rank only candidates that share (or are one bit-flip
    away from) the query's LSH bucket."""
    base = _norm_df(emb, id_col, vec_col)
    buckets = bucket_ids(emb, planes, seed, id_col, vec_col)
    corpus = base.join(buckets, "id")
    qb = buckets.filter(F.col("id").isin(query_ids))
    # multi-probe: the query's bucket plus every single-bit flip
    probes = qb.select(
        F.col("id").alias("qid"),
        F.explode(F.array(*([F.col("bucket")] + [
            F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(planes)
        ]))).alias("bucket"))
    q = base.filter(F.col("id").isin(query_ids)) \
            .select(F.col("id").alias("qid"), F.col("v").alias("qv"),
                    F.col("nrm").alias("qnrm"))
    cand = (corpus.join(F.broadcast(probes), "bucket")
            .filter(F.col("id") != F.col("qid"))
            .join(F.broadcast(q), "qid"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (cand.select("qid", F.col("id").alias("nid"), cos.alias("cosine"))
            .distinct()
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", F.round("cosine", 6).alias("cosine"))
            .orderBy("qid", "rank"))
