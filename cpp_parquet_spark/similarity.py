"""Similarity search over an embedding column (array<float>).

Three paths, matching what a 100 TB training-data pipeline needs:

- :func:`brute_topk` — exact cosine top-k: broadcast the (small) query
  set against the corpus, dot products in SQL higher-order functions
  (zip_with/aggregate, JVM-side), window rank per query. The baseline and
  the correctness oracle.
- :func:`lsh_topk` — the data-independent scale path: deterministic
  random-hyperplane LSH buckets (sign bits of seeded projections,
  computed in ONE numpy matmul per Arrow batch), multi-probe (flip each
  bit once) so a query scans ~(planes+1)/2**planes of the corpus instead
  of all of it. Same ranking semantics within the probed candidate set.
- :func:`ivf_topk` — the data-ADAPTIVE scale path: an IVF coarse
  quantizer (deterministic distributed k-means, :func:`ivf_train`)
  partitions the corpus into cells; a query scans only its ``nprobe``
  nearest cells. Adapts to clustered embedding distributions where
  random hyperplanes split clusters; with nprobe = n_centroids it
  reproduces exact brute force (the oracle hook).

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


def ivf_train(emb: DataFrame, n_centroids: int = 16, iters: int = 3,
              seed: int = 42, id_col: str = "vec_id",
              vec_col: str = "embedding") -> np.ndarray:
    """Deterministic distributed k-means (Lloyd) for an IVF coarse
    quantizer: returns an L2-normalized (n_centroids, dim) float64 array.

    Spark shape per iteration: one mapInPandas pass emits PER-TASK
    partial sums — at most (n_centroids, dim+1) numbers per task, i.e.
    metadata-sized regardless of corpus size — which the driver combines
    (the same driver-side-decisions pattern as the stats pass; no row
    data ever reaches the driver). Init is a deterministic hash-ordered
    sample, so the index is reproducible across runs and cluster sizes.
    """
    init_rows = (emb.select(id_col, vec_col)
                 .withColumn("__h", F.xxhash64(F.col(id_col)))
                 .orderBy("__h").limit(n_centroids).collect())
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                      for r in init_rows])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True).clip(min=1e-12)

    part_schema = T.StructType([
        T.StructField("cid", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("vsum", T.ArrayType(T.DoubleType())),
    ])
    src = emb.select(vec_col)
    for _ in range(iters):
        c = cents  # rebind for closure capture per iteration

        def partial(batches, c=c):
            sums = np.zeros_like(c)
            cnts = np.zeros(c.shape[0], dtype=np.int64)
            for pdf in batches:
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                m /= np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
                cid = np.argmax(m @ c.T, axis=1)      # cosine assignment
                np.add.at(sums, cid, m)
                cnts += np.bincount(cid, minlength=c.shape[0])
            nz = np.flatnonzero(cnts)
            if nz.shape[0]:
                yield pd.DataFrame({"cid": nz.astype(np.int32),
                                    "cnt": cnts[nz],
                                    "vsum": list(sums[nz])})

        rows = src.mapInPandas(partial, part_schema).collect()
        sums = np.zeros_like(cents)
        cnts = np.zeros(cents.shape[0], dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["vsum"])
            cnts[r["cid"]] += r["cnt"]
        live = cnts > 0
        cents[live] = sums[live] / cnts[live, None]
        cents /= np.linalg.norm(cents, axis=1, keepdims=True).clip(min=1e-12)
    return cents


def ivf_assign(emb: DataFrame, cents: np.ndarray, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, cid): nearest-centroid assignment, one matmul per batch."""
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("cid", T.IntegerType()),
    ])

    def kernel(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
            cid = np.argmax(m @ cents.T, axis=1)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(dtype=np.int64),
                                "cid": cid.astype(np.int32)})

    return emb.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, iters: int = 3,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k via an IVF index: rank only candidates whose centroid is
    among the query's ``nprobe`` nearest centroids.

    At 100 TB: the index build touches each vector iters+1 times with
    only metadata-sized aggregates shuffled; the query scans
    ~nprobe/n_centroids of the corpus. The candidate join broadcasts the
    (qid, cid) probe table, so the corpus never shuffles — same scale
    shape as lsh_topk with a data-adaptive partition instead of random
    hyperplanes."""
    cents = ivf_train(emb, n_centroids, iters, seed, id_col, vec_col)
    base = _norm_df(emb, id_col, vec_col)
    corpus = base.join(ivf_assign(emb, cents, id_col, vec_col), "id")

    q = base.filter(F.col("id").isin(query_ids)) \
            .select(F.col("id").alias("qid"), F.col("v").alias("qv"),
                    F.col("nrm").alias("qnrm"))
    qrows = q.select("qid", "qv").collect()   # |queries| rows only
    probes = []
    for r in qrows:
        v = np.asarray(r["qv"], dtype=np.float64)
        v /= np.linalg.norm(v).clip(min=1e-12)
        top = np.argsort(-(cents @ v))[:nprobe]
        probes.extend((int(r["qid"]), int(c)) for c in top)
    probe_df = emb.sparkSession.createDataFrame(probes, "qid long, cid int")

    cand = (corpus.join(F.broadcast(probe_df), "cid")
            .filter(F.col("id") != F.col("qid"))
            .join(F.broadcast(q), "qid"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (cand.select("qid", F.col("id").alias("nid"), cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", F.round("cosine", 6).alias("cosine"))
            .orderBy("qid", "rank"))


def lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             planes: int = 6, seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding", all_probes: bool = False) -> DataFrame:
    """ANN top-k: rank only candidates that share (or are one bit-flip
    away from) the query's LSH bucket.

    ``all_probes=True`` probes every one of the 2^planes buckets, which
    makes the candidate set the whole corpus and the result EXACTLY the
    brute-force top-k — the oracle-checkable degenerate case (driver
    query ``ann_lsh_full_probe``), same role as IVF's full-probe
    companion. Scoring arithmetic is identical either way, so the
    full-probe hash match certifies the bucketed path's scoring too."""
    base = _norm_df(emb, id_col, vec_col)
    buckets = bucket_ids(emb, planes, seed, id_col, vec_col)
    corpus = base.join(buckets, "id")
    qb = buckets.filter(F.col("id").isin(query_ids))
    if all_probes:
        probes = qb.select(
            F.col("id").alias("qid"),
            F.explode(F.sequence(
                F.lit(0), F.lit((1 << planes) - 1))).alias("bucket"))
    else:
        # multi-probe: the query's bucket plus every single-bit flip
        probes = qb.select(
            F.col("id").alias("qid"),
            F.explode(F.array(*([F.col("bucket")] + [
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(planes)
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
