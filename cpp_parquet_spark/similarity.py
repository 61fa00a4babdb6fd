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


def pq_train(emb: DataFrame, m: int = 8, ksub: int = 16, iters: int = 3,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011, TPAMI):
    returns a (m, ksub, dsub) float64 array — ``m`` contiguous
    subspaces of the L2-normalized vectors, each quantized by its own
    ksub-centroid codebook.

    Same deterministic distributed Lloyd shape as :func:`ivf_train`,
    but ALL m subspace k-means run in the ONE mapInPandas pass per
    iteration: each task emits per-(subspace, centroid) partial sums —
    at most m*ksub*(dsub+1) numbers, metadata-sized regardless of
    corpus size — and the driver combines. Init is the same
    hash-ordered deterministic sample, so the index is reproducible
    across runs and cluster sizes. Assignment minimizes subspace L2
    distance (argmax of x.c - ||c||^2/2)."""
    init_rows = (emb.select(id_col, vec_col)
                 .withColumn("__h", F.xxhash64(F.col(id_col)))
                 .orderBy("__h").limit(ksub).collect())
    if len(init_rows) < ksub:
        raise ValueError(
            f"pq_train needs >= ksub={ksub} vectors, got {len(init_rows)}"
            " — lower ksub or use brute_topk at this corpus size")
    v0 = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                   for r in init_rows])
    v0 /= np.linalg.norm(v0, axis=1, keepdims=True).clip(min=1e-12)
    dim = v0.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.ascontiguousarray(
        v0.reshape(ksub, m, dsub).transpose(1, 0, 2))   # (m, ksub, dsub)

    part_schema = T.StructType([
        T.StructField("sub", T.IntegerType()),
        T.StructField("cid", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("vsum", T.ArrayType(T.DoubleType())),
    ])
    src = emb.select(vec_col)
    for _ in range(iters):
        b = books

        def partial(batches, b=b):
            m_, ksub_, dsub_ = b.shape
            sums = np.zeros_like(b)
            cnts = np.zeros((m_, ksub_), dtype=np.int64)
            half = 0.5 * (b ** 2).sum(axis=2)           # (m, ksub)
            for pdf in batches:
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                x /= np.linalg.norm(x, axis=1, keepdims=True).clip(min=1e-12)
                xs = x.reshape(x.shape[0], m_, dsub_)
                for s in range(m_):
                    cid = np.argmax(xs[:, s, :] @ b[s].T - half[s], axis=1)
                    np.add.at(sums[s], cid, xs[:, s, :])
                    cnts[s] += np.bincount(cid, minlength=ksub_)
            subs, cids = np.nonzero(cnts)
            if subs.shape[0]:
                yield pd.DataFrame({"sub": subs.astype(np.int32),
                                    "cid": cids.astype(np.int32),
                                    "cnt": cnts[subs, cids],
                                    "vsum": list(sums[subs, cids])})

        rows = src.mapInPandas(partial, part_schema).collect()
        sums = np.zeros_like(books)
        cnts = np.zeros((m, ksub), dtype=np.int64)
        for r in rows:
            sums[r["sub"], r["cid"]] += np.asarray(r["vsum"])
            cnts[r["sub"], r["cid"]] += r["cnt"]
        live = cnts > 0
        books[live] = sums[live] / cnts[live][:, None]
    return books


def pq_encode(emb: DataFrame, books: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes): per-vector PQ codes — array<int> of length m, the
    4-8 byte representation that replaces dim*4 bytes at 100 TB."""
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])
    m, ksub, dsub = books.shape
    half = 0.5 * (books ** 2).sum(axis=2)

    def kernel(batches):
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            x /= np.linalg.norm(x, axis=1, keepdims=True).clip(min=1e-12)
            xs = x.reshape(x.shape[0], m, dsub)
            codes = np.empty((x.shape[0], m), dtype=np.int32)
            for s in range(m):
                codes[:, s] = np.argmax(xs[:, s, :] @ books[s].T - half[s],
                                        axis=1)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(dtype=np.int64),
                                "codes": list(codes)})

    return emb.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def pq_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
            m: int = 8, ksub: int = 16, iters: int = 3, seed: int = 42,
            rerank: int = 4, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """ANN top-k via product quantization with asymmetric distance
    computation (ADC) + exact re-rank: approximate scores are LUT sums
    (per query: an (m, ksub) table of subspace dot products, one gather
    per corpus code instead of a dim-wide dot product), each partition
    keeps its top ``rerank*k`` candidates, and only those re-rank with
    the EXACT JVM cosine — identical arithmetic, window ordering, and
    rounding as :func:`brute_topk`, so with ``rerank*k >= |corpus|``
    the output is bit-identical to brute force (the oracle companion).

    At 100 TB: the corpus never shuffles (LUTs ride the closure, the
    per-partition fold emits <= rerank*k rows per query per task); codes
    are m bytes-ish per vector, so the ADC scan reads ~dim*4/m x fewer
    bytes than brute force."""
    books = pq_train(emb, m, ksub, iters, seed, id_col, vec_col)
    codes = pq_encode(emb, books, id_col, vec_col)
    base = _norm_df(emb, id_col, vec_col)
    q = base.filter(F.col("id").isin(query_ids)) \
            .select(F.col("id").alias("qid"), F.col("v").alias("qv"),
                    F.col("nrm").alias("qnrm"))
    qrows = q.select("qid", "qv").collect()   # |queries| rows only
    dsub = books.shape[2]
    luts = {}
    for r in qrows:
        v = np.asarray(r["qv"], dtype=np.float64)
        v /= np.linalg.norm(v).clip(min=1e-12)
        qs = v.reshape(m, dsub)
        luts[int(r["qid"])] = np.einsum("sd,skd->sk", qs, books)  # (m, ksub)

    out_schema = T.StructType([
        T.StructField("qid", T.LongType()),
        T.StructField("nid", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])
    subs = np.arange(m)

    def adc(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            cm = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            for qid, lut in luts.items():
                sc = lut[subs[None, :], cm].sum(axis=1)
                keep = ids != qid
                if keep.any():
                    yield pd.DataFrame({"qid": qid, "nid": ids[keep],
                                        "cosine": sc[keep]})

    scored = codes.mapInPandas(adc, out_schema)
    cand = _partition_topk(scored, max(int(rerank) * k, k)) \
        .select("qid", "nid").distinct()
    ex = (cand.join(base.withColumnRenamed("id", "nid"), "nid")
          .join(F.broadcast(q), "qid"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    exact = ex.select("qid", "nid", cos.alias("cosine"))
    return (_partition_topk(exact, k)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", F.round("cosine", 6).alias("cosine"))
            .orderBy("qid", "rank"))
