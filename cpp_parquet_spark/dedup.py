"""Deduplication operators for a large-scale training-data pipeline.

Five dedup families, each with the Spark-first shape that survives 100 TB:

- :func:`exact_stats` / :func:`exact_survivors` — hash-groupBy exact dedup
  (one shuffle on the content hash).
- :func:`shingles` + :func:`ngram_jaccard_pairs` — exact n-gram Jaccard
  via explode + self-join (built-ins only; the join key is (scope,
  shingle), so Catalyst shuffles once and the per-scope fan-out bounds the
  pair blow-up).
- :func:`minhash_signatures` + :func:`lsh_candidates` +
  :func:`minhash_dedup_pairs` — MinHash+LSH near-dup at scale: signatures
  are computed in ONE vectorized numpy pass (mapInPandas, no per-row
  Python), candidates come from an equi-join on (band, band_signature) —
  the classic "bucket join" that replaces the quadratic all-pairs compare.
- :func:`simhash` + :func:`simhash_pairs` — 64-bit SimHash built entirely
  from JVM-side expressions (explode + xxhash64 + bit votes), near-dup =
  hamming distance <= k with a block-LSH prefilter (pigeonhole: any pair
  within hamming k agrees exactly on >= 1 of k+1 blocks).
- :func:`embedding_cosine_pairs` — embedding near-dup via exact cosine
  over an equi-join scope (label), dot products in SQL higher-order
  functions (zip_with/aggregate — JVM, no UDF).

Determinism: every hash is seeded constant; no RNG anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_stats(df: DataFrame, text_col: str = "text",
                scope: str = "source") -> DataFrame:
    """Per-scope exact-duplicate statistics via sha256 hash-groupBy."""
    h = F.sha2(F.col(text_col).cast("binary"), 256)
    return (df.select(F.col(scope).alias("scope"), h.alias("h"))
            .groupBy("scope")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("h").alias("n_unique"),
                 (F.count("*") - F.countDistinct("h")).alias("n_removed"))
            .orderBy("scope"))


def exact_survivors(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per distinct content (the canonical exact-dedup
    output). One shuffle on the content hash."""
    h = F.sha2(F.col(text_col).cast("binary"), 256).alias("__h")
    keep = (df.select(h, F.col(id_col))
            .groupBy("__h").agg(F.min(id_col).alias(id_col)))
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, built-ins only)
# ---------------------------------------------------------------------------


def shingles(df: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id", scope: str = "source",
             prefix: int = 512) -> DataFrame:
    """Distinct character n-grams of the first ``prefix`` chars per doc."""
    t = F.substring(F.col(text_col), 1, prefix)
    npos = F.greatest(F.length(t) - F.lit(n - 1), F.lit(1))
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), npos), lambda i: t.substr(i, F.lit(n))))
    return (df.select(F.col(id_col).alias("id"),
                      F.col(scope).alias("scope"),
                      F.explode(grams).alias("g")))


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.7,
                        text_col: str = "text", id_col: str = "doc_id",
                        scope: str = "source", prefix: int = 512,
                        max_gram_df: int | None = 256) -> DataFrame:
    """Exact Jaccard similarity over n-gram sets for all same-scope pairs
    with J >= threshold. explode -> equi-join on (scope, gram) ->
    count = |A ∩ B|; |A ∪ B| = |A|+|B|-|A ∩ B|.

    ``max_gram_df`` is the scale guard: a gram held by more than that many
    docs in a scope (``"the"``, a run of spaces, license boilerplate) is a
    stopword shingle — it carries ~no similarity signal but makes the
    intersect join quadratic in its document frequency. When set, such
    grams are dropped from EVERY doc's shingle set before sizes and
    intersections, so the Jaccard stays a true set Jaccard over the
    retained (discriminative) grams and the join's per-key fan-out is
    bounded by the cap. The default is a finite cap (256) so a caller
    who never thinks about skew cannot get the quadratic stopword-gram
    join at scale; pass ``max_gram_df=None`` to opt in to the exact
    textbook Jaccard (unbounded per-gram fan-out)."""
    sh = shingles(df, n, text_col, id_col, scope, prefix)
    if max_gram_df is not None:
        keep = (sh.groupBy("scope", "g")
                .agg(F.count("*").alias("__df"))
                .filter(F.col("__df") <= max_gram_df)
                .drop("__df"))
        sh = sh.join(keep, ["scope", "g"], "left_semi")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, [F.col("a.scope") == F.col("b.scope"),
                        F.col("a.g") == F.col("b.g"),
                        F.col("a.id") < F.col("b.id")])
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("c")))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    j = F.col("c") / (F.col("sz_a") + F.col("sz_b") - F.col("c"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_P31 = (1 << 31) - 1  # Mersenne prime: a,b,h < 2^31 so a*h+b < 2^63 — the
#                       Carter-Wegman multiply is EXACT in uint64 (no wrap,
#                       so collision probability really tracks Jaccard)


def _perm_coeffs(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P31, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _P31, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes_flat(texts: pd.Series, n: int,
                         prefix: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch-flat distinct char-n-gram hashes: (hashes uint64[total],
    counts int64[ndocs]) where doc i owns hashes[sum(counts[:i]):...].

    Fully vectorized — one rolling polynomial-hash pass over the batch's
    concatenated bytes, one lexsort for per-doc dedup; docs shorter than
    ``n`` get a single sentinel hash 0 so every doc has >= 1 entry
    (np.minimum.reduceat needs non-empty segments)."""
    clipped = texts.fillna("").str.slice(0, prefix)
    data = clipped.str.encode("utf-8")
    lens = data.str.len().to_numpy(dtype=np.int64)
    ndocs = lens.shape[0]
    flat = np.frombuffer(b"".join(data.tolist()), dtype=np.uint8)
    nh = max(flat.shape[0] - n + 1, 0)
    h = np.zeros(nh, dtype=np.uint64)
    if nh:
        mul = np.uint64(1099511628211)        # FNV-ish odd multiplier
        acc = np.zeros(nh, dtype=np.uint64)
        for k in range(n):                     # loop over n (tiny), not rows
            acc = acc * mul + flat[k: k + nh].astype(np.uint64)
        h = acc
    offs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    npos = np.maximum(lens - (n - 1), 0)       # shingle positions per doc
    cum = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(npos, out=cum[1:])
    # gather each doc's in-bounds positions (boundary-crossing hashes skipped)
    idx = (np.arange(cum[-1], dtype=np.int64)
           - np.repeat(cum[:-1], npos) + np.repeat(offs[:-1], npos))
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), npos)
    hs = h[idx]
    # per-doc distinct: sort by (doc, hash), keep first occurrences
    order = np.lexsort((hs, doc_idx))
    hs, ds = hs[order], doc_idx[order]
    if hs.shape[0]:
        keep = np.ones(hs.shape[0], dtype=bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])
        hs, ds = hs[keep], ds[keep]
    counts = np.bincount(ds, minlength=ndocs).astype(np.int64)
    empty = np.flatnonzero(counts == 0)
    if empty.shape[0]:
        pos = np.zeros(ndocs + 1, dtype=np.int64)
        np.cumsum(counts, out=pos[1:])
        hs = np.insert(hs, pos[empty], np.uint64(0))
        counts[empty] = 1
    return hs, counts


def minhash_signature_vectors(df: DataFrame, num_perm: int = 64, n: int = 4,
                              text_col: str = "text", id_col: str = "doc_id",
                              prefix: int = 512, seed: int = 42) -> DataFrame:
    """(id, vec) rows: the full MinHash signature as ``array<bigint>`` of
    length ``num_perm`` — ONE row per doc, the single source for both the
    LSH band keys (:func:`minhash_bands`, derived JVM-side) and the
    signature-agreement Jaccard estimate that prefilters candidates.

    Kernel shape: per Arrow batch, ONE flat shingle-hash pass, then a
    constant-count loop of broadcast multiplies + ``np.minimum.reduceat``
    segmented minima over the whole batch — no per-row Python. Peak temp
    memory is shingles x chunk x 8B, independent of num_perm."""
    a, b = _perm_coeffs(num_perm, seed)
    p = np.uint64(_P31)
    chunk = 16                                 # perms per vectorized slab

    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("vec", T.ArrayType(T.LongType())),
    ])

    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            ndocs = ids.shape[0]
            if ndocs == 0:
                continue
            hs, counts = _shingle_hashes_flat(pdf[text_col], n, prefix)
            hp = hs % p
            starts = np.zeros(ndocs, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            sig = np.empty((ndocs, num_perm), dtype=np.uint64)
            for lo in range(0, num_perm, chunk):
                sl = slice(lo, min(lo + chunk, num_perm))
                v = (hp[:, None] * a[None, sl] + b[None, sl]) % p
                sig[:, sl] = np.minimum.reduceat(v, starts, axis=0)
            yield pd.DataFrame({
                "id": ids,
                "vec": list(sig.view(np.int64)),
            })

    src = df.select(id_col, text_col)
    # small-file inputs (one row group) would run the kernel on ONE task;
    # widen to the session's parallelism when the scan is narrower. At
    # production scale the source has >> cores partitions and this is a
    # no-op (no shuffle added).
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(kernel, out_schema)


def minhash_bands(vecs: DataFrame, num_perm: int = 64,
                  bands: int = 16) -> DataFrame:
    """(id, band, sig) band keys derived JVM-side from the signature
    vector: ``sig = xxhash64(band, vec[band slice])`` — equal slices give
    equal keys, unequal slices differ almost surely (a cross-slice
    collision only adds a candidate, which exact verify rejects)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    rows = F.array(*[
        F.struct(F.lit(bi).cast("int").alias("band"),
                 F.xxhash64(F.lit(bi), F.slice("vec", bi * r + 1, r))
                  .alias("sig"))
        for bi in range(bands)])
    return (vecs.select("id", F.explode(rows).alias("bs"))
            .select("id", F.col("bs.band").alias("band"),
                    F.col("bs.sig").alias("sig")))


def minhash_signatures(df: DataFrame, num_perm: int = 64, n: int = 4,
                       bands: int = 16, text_col: str = "text",
                       id_col: str = "doc_id", prefix: int = 512,
                       seed: int = 42) -> DataFrame:
    """(id, band, sig) rows — banded MinHash signature, one row per band
    (compatibility wrapper over :func:`minhash_signature_vectors` +
    :func:`minhash_bands`)."""
    return minhash_bands(
        minhash_signature_vectors(df, num_perm, n, text_col, id_col,
                                  prefix, seed),
        num_perm, bands)


def lsh_candidates(sigs: DataFrame, max_bucket: int | None = 128) -> DataFrame:
    """Distinct candidate pairs from the band-bucket equi-join.

    ``max_bucket`` drops buckets with more members than the bound before
    the self-join: one degenerate band value (empty/boilerplate docs that
    hash identically) would otherwise produce a quadratic candidate set.
    A pair lost to one overfull bucket still surfaces through any of its
    other bands; content duplicated > max_bucket times corpus-wide is
    exact-dedup's job (:func:`exact_survivors`), not LSH's. The size agg
    and the semi-join shuffle on the same (band, sig) key as the
    self-join, so AQE co-partitions all three."""
    if max_bucket is not None:
        ok = (sigs.groupBy("band", "sig")
              .agg(F.count("*").alias("__bn"))
              .filter(F.col("__bn") <= max_bucket)
              .drop("__bn"))
        sigs = sigs.join(ok, ["band", "sig"], "left_semi")
    a, b = sigs.alias("a"), sigs.alias("b")
    return (a.join(b, [F.col("a.band") == F.col("b.band"),
                       F.col("a.sig") == F.col("b.sig"),
                       F.col("a.id") < F.col("b.id")])
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def minhash_dedup_pairs(df: DataFrame, threshold: float = 0.7,
                        num_perm: int = 64, n: int = 4, bands: int = 16,
                        text_col: str = "text", id_col: str = "doc_id",
                        prefix: int = 512, seed: int = 42,
                        max_bucket: int | None = 128,
                        prefilter_margin: float | None = 0.25) -> DataFrame:
    """MinHash-LSH candidates verified with exact n-gram Jaccard.

    Scale shape: signatures are linear in input and computed ONCE (the
    vector DF is persisted — bands, bucket join and the estimate all read
    it); the bucket join touches only colliding bands (bounded by
    ``max_bucket``); candidates are then PREFILTERED by the signature-
    agreement Jaccard estimate (zip_with over the two 64-long vectors,
    pure JVM) before the expensive exact shingle-intersect join. On
    corpora where moderately-similar docs flood the bands (boilerplate,
    pool-generated text: measured 462k candidates for 256 true pairs on
    the sf0.1 fixture), the estimate kills ~99% of false candidates for
    the cost of one broadcast-shaped join.

    ``prefilter_margin``: candidates with estimate <
    ``threshold - margin`` are dropped. With 64 perms the estimator std
    at J=0.7 is ~0.057, so the default 0.25 margin is ~4.4 sigma — no
    true pair lost (verified against brute force on the fixtures, which
    is deterministic: fixed seed, fixed data). ``None`` disables."""
    vecs = minhash_signature_vectors(df, num_perm, n, text_col, id_col,
                                     prefix, seed)
    from pyspark import StorageLevel
    vecs = vecs.persist(StorageLevel.MEMORY_AND_DISK)
    cand = lsh_candidates(minhash_bands(vecs, num_perm, bands), max_bucket)
    if prefilter_margin is not None:
        va = vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
        vb = vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
        eq = F.aggregate(
            F.zip_with("va", "vb",
                       lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0), lambda acc, x: acc + x)
        cand = (cand.join(va, "id_a").join(vb, "id_b")
                .filter(eq >= F.lit((threshold - prefilter_margin)
                                    * num_perm))
                .select("id_a", "id_b"))
    cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    # shingle-explode only the docs that survived into a candidate pair —
    # the exact verify never touches the rest of the corpus; persisted
    # because it feeds three consumers (sizes + both sides of the
    # intersect join) and recomputing the explode trebles the hot path
    ids = (cand.select(F.col("id_a").alias(id_col))
           .union(cand.select(F.col("id_b").alias(id_col))).distinct())
    sh = shingles(df.join(ids, id_col, "left_semi"), n, text_col, id_col,
                  scope=id_col, prefix=prefix).drop("scope") \
        .persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    pa_, pb = sh.alias("pa"), sh.alias("pb")
    inter = (cand.join(pa_, F.col("id_a") == F.col("pa.id"))
             .join(pb, (F.col("id_b") == F.col("pb.id"))
                   & (F.col("pa.g") == F.col("pb.g")))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("c")))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    j = F.col("c") / (F.col("sz_a") + F.col("sz_b") - F.col("c"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# SimHash (JVM-side end to end)
# ---------------------------------------------------------------------------


def _simhash_nbits(token_hash: str) -> int:
    return {"xxhash64": 64, "md5_60": 60}[token_hash]


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", seed: int = 42,
            token_hash: str = "xxhash64") -> DataFrame:
    """SimHash from whitespace tokens, entirely in SQL expressions:
    explode tokens -> token hash -> per-bit +/-1 votes -> sign bits.

    No Python at all — whole-stage codegen end to end, one shuffle
    (the groupBy on id).

    ``token_hash``: ``"xxhash64"`` (64 bits, default, fastest) or
    ``"md5_60"`` (60 bits from the first 15 hex chars of md5) — the md5
    variant exists so a SQL oracle (DuckDB) can recompute the IDENTICAL
    simhash: md5 is the one keyed hash both engines share."""
    nbits = _simhash_nbits(token_hash)
    if token_hash == "xxhash64":
        h = F.xxhash64(F.col("tok"), F.lit(seed))
    else:
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15),
                   16, 10).cast("long")
    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                       .alias("tok"))
            .withColumn("h", h))
    votes = [F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1,
                          1).otherwise(-1)).alias(f"v{i}")
             for i in range(nbits)]
    agg = toks.groupBy("id").agg(*votes)
    sh = None
    for i in range(nbits):
        bit = F.when(F.col(f"v{i}") > 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sh = term if sh is None else sh.bitwiseXOR(term)
    return agg.select("id", sh.alias("simhash"))


def simhash_pairs(df: DataFrame, max_hamming: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  seed: int = 42, token_hash: str = "xxhash64") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Block-LSH prefilter, COMPLETE by construction: the hash's bits are
    split into ``max_hamming + 1`` blocks, so by pigeonhole any pair
    within the hamming budget agrees exactly on at least one block — the
    block equi-join generates every qualifying pair (no silent misses at
    any budget), and the bit_count compare rejects false candidates."""
    nbits = _simhash_nbits(token_hash)
    if not 0 <= max_hamming < nbits:
        raise ValueError(f"max_hamming must be in [0, {nbits})")
    nblk = max_hamming + 1
    base_w, extra = divmod(nbits, nblk)        # block widths differ by <= 1
    widths = [base_w + (1 if i < extra else 0) for i in range(nblk)]
    lows = [sum(widths[:i]) for i in range(nblk)]
    sh = simhash(df, text_col, id_col, seed, token_hash)

    def _block_key(i: int):
        if widths[i] >= 64:                    # max_hamming=0: exact match
            return F.col("simhash")
        return (F.shiftright("simhash", lows[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1)))

    blocks = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"), _block_key(i).alias("key"))
            for i in range(nblk)])).alias("bk"))
    blocks = blocks.select("id", "simhash", "bk.blk", "bk.key")
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, [F.col("a.blk") == F.col("b.blk"),
                       F.col("a.key") == F.col("b.key"),
                       F.col("a.id") < F.col("b.id")])
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct().orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def embedding_cosine_pairs(emb: DataFrame, threshold: float = 0.35,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           scope: str = "label") -> DataFrame:
    """Near-dup pairs by exact cosine similarity within a scope (label) —
    the equi-join scope is what keeps this from being all-pairs at scale;
    for scopeless corpora use the LSH bucketing in
    :mod:`cpp_parquet_spark.similarity` instead."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("id"), F.col(scope).alias("scope"),
                      v.alias("v")) \
              .withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a, b = base.alias("a"), base.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (a.join(b, [F.col("a.scope") == F.col("b.scope"),
                       F.col("a.id") < F.col("b.id")])
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.scope").alias("scope"),
                    F.round(cos, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold)
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# connected components / canonical survivors
# ---------------------------------------------------------------------------


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 30) -> DataFrame:
    """(id, component) for every node appearing in ``pairs`` — the
    transitive closure that turns pairwise near-dup output into clusters;
    ``component`` is the minimum id of the cluster.

    Algorithm: min-label propagation with pointer jumping. Each round
    does (1) a neighbor-min step — every node takes the min of its own
    label and its neighbors' labels (one shuffle join on the edge list)
    — and (2) a pointer-jump step — every node replaces its label with
    its label's label (a self-join of the label table). The jump doubles
    the effective propagation distance per round, so convergence is
    O(log(diameter)) rounds, not O(diameter): a 1,000-link chain of
    near-dups converges in ~10 rounds where plain propagation needs
    1,000. Each round is two shuffles over tables no larger than
    (edges + nodes) — the shape that survives a 100 TB pair set.

    The driver loop runs one tiny action per round (a change count) and
    truncates each round's lineage with ``localCheckpoint`` — iterative
    self-joins otherwise grow the logical plan each round and Catalyst
    analysis time explodes long before the data does. Iteration stops at
    fixpoint or ``max_iter`` (raises if not converged — a diameter bound
    of 2**max_iter nodes makes that unreachable in practice).
    """
    from pyspark import StorageLevel

    e = (pairs.select(F.col(id_a).cast("long").alias("u"),
                      F.col(id_b).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v")))
    edges = e.unionByName(e.select(F.col("v").alias("u"),
                                   F.col("u").alias("v"))) \
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)

    labels = (edges.groupBy("u")
              .agg(F.least(F.min("v"), F.first("u")).alias("lbl"))
              .select(F.col("u").alias("id"), "lbl")
              .localCheckpoint(eager=True))

    for _ in range(max_iter):
        # (1) neighbor-min: min over own label and neighbors' labels
        nbr = (edges.join(labels.withColumnRenamed("id", "v"), "v")
               .groupBy("u").agg(F.min("lbl").alias("nlbl"))
               .withColumnRenamed("u", "id"))
        stepped = (labels.join(nbr, "id", "left")
                   .select("id", F.least("lbl", F.coalesce("nlbl", "lbl"))
                           .alias("lbl")))
        # (2) pointer jump: lbl <- lbl(lbl)  (labels are node ids, and
        # every label is itself a node, so the lookup always hits)
        tgt = stepped.select(F.col("id").alias("lbl"),
                             F.col("lbl").alias("jlbl"))
        jumped = (stepped.join(tgt, "lbl", "left")
                  .select("id", F.least("lbl", F.coalesce("jlbl", "lbl"))
                          .alias("lbl"))
                  .localCheckpoint(eager=True))
        changed = (jumped.join(labels.withColumnRenamed("lbl", "old"), "id")
                   .filter(F.col("lbl") != F.col("old")).limit(1).count())
        labels = jumped
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no fixpoint in "
                           f"{max_iter} rounds")
    edges.unpersist()
    return labels.select("id", F.col("lbl").alias("component"))


def near_dup_survivors(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Canonical-survivor dedup: keep one doc (the min id) per near-dup
    cluster, plus every doc that appears in no pair. The standard final
    step of a near-dedup pipeline (pairs from MinHash/SimHash/cosine)."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")) \
        .select(F.col("id").alias(id_col))
    return df.join(losers, id_col, "left_anti")


def dedup_lines(df: DataFrame, keep_first: bool = True,
                min_df: int | None = None, sep: str = "\n",
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """C4/CCNet-style cross-document span dedup at line granularity:
    every duplicated non-blank line keeps exactly one global occurrence
    — the lowest (doc_id, line_idx) — and with ``min_df=k`` any line
    occurring in >= k distinct docs is dropped from ALL docs
    (boilerplate/footer strip; set ``keep_first=False`` to strip
    without deduping the long tail). Blank lines are structure, not
    content: always kept. Returns one row per input doc — (id, text
    with surviving lines re-joined, n_lines, n_removed) — including
    docs whose every line was removed (text '').

    Scale shape (100 TB): owners come from a ``groupBy(md5(line))``
    computing ``min(struct(doc_id, idx))`` + distinct-doc count — both
    partial-aggregated map-side, so a boilerplate line duplicated a
    billion times combines locally instead of flooding one reducer.
    The owner table (one row per DISTINCT duplicated-or-not line) then
    equi-joins back; each key matches exactly one owner row, so AQE
    skew-split handles hot keys. Reassembly is one groupBy on doc_id
    (skew-free). Keys are md5 (128-bit) so the oracle can recompute
    them and collisions are out of reach at 10^12 lines, unlike 64-bit."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("idx", "line"))
    content = lines.filter(F.trim("line") != "")
    owners = (content.groupBy(F.md5("line").alias("k"))
              .agg(F.min(F.struct(F.col(id_col).alias("d"),
                                  F.col("idx").alias("i"))).alias("own"),
                   F.count_distinct(id_col).alias("ndocs")))
    j = lines.join(owners, F.md5(lines["line"]) == owners["k"], "left")
    is_blank = F.col("k").isNull()
    is_owner = ((F.col("own.d") == F.col(id_col))
                & (F.col("own.i") == F.col("idx")))
    keep = is_blank | ((is_owner if keep_first else F.lit(True))
                       & ((F.col("ndocs") < F.lit(int(min_df)))
                          if min_df is not None else F.lit(True)))
    return (j.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(keep, F.struct("idx", "line")))),
                         lambda s: s["line"]),
                     sep).alias(text_col),
                 F.count("*").alias("n_lines"),
                 (F.count("*") - F.sum(keep.cast("long")))
                 .alias("n_removed")))


def dup_span_coverage(df: DataFrame, w: int = 5, min_count: int = 2,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Duplicated-SPAN coverage per document (ExactSubstr-lite after Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): a span is a window of ``w`` consecutive whitespace tokens;
    it is duplicated when the identical window occurs >= ``min_count``
    times across the whole corpus (within- and cross-document). Returns
    one row per input doc — (id, n_tokens, dup_windows, covered_tokens,
    dup_frac) — where ``covered_tokens`` is the size of the UNION of the
    duplicated windows' token intervals (overlaps merged, the standard
    coverage definition), so ``dup_frac`` is the fraction of the doc
    inside some corpus-duplicated span. Filter on ``dup_frac`` to drop
    memorization-prone documents; finer-grained than dedup_lines (no
    newline structure needed) and cheaper than a suffix array.

    Scale shape (100 TB): windows are built JVM-side (sequence/slice/
    concat_ws inside codegen, no Python); the one heavy shuffle is the
    ``groupBy(window)`` count, which partial-aggregates map-side so a
    boilerplate window duplicated a billion times combines locally. The
    duplicated-window table (distinct keys only) equi-joins back —
    1 matching build row per key, AQE skew-split friendly. Coverage is
    a per-doc window function (bounded by doc length, skew-free). Keys
    here are the md5 of the window text so the DuckDB oracle can replay
    them exactly; at 10^12 docs swap in xxhash64 for cheaper keys."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__toks"),
                     F.size(toks).alias("n_tokens"))
    # windows: 1-based slice starts 1..n-w+1; guarded CASE because
    # sequence(1, k) with k <= 0 would produce a DESCENDING sequence
    grams_expr = F.expr(
        f"CASE WHEN size(__toks) >= {w} THEN "
        f"transform(sequence(1, size(__toks) - {w - 1}), "
        f"i -> md5(concat_ws(' ', slice(__toks, i, {w})))) "
        f"ELSE array() END")
    wins = (base.select(id_col,
                        F.posexplode(grams_expr).alias("pos", "k")))
    dup = (wins.groupBy("k").agg(F.count("*").alias("c"))
           .filter(F.col("c") >= int(min_count)).select("k"))
    dpos = wins.join(dup, "k").select(id_col, "pos")
    from pyspark.sql.window import Window
    ww = Window.partitionBy(id_col).orderBy("pos")
    cov = (dpos.withColumn("__prev", F.lag("pos").over(ww))
           .groupBy(id_col)
           .agg(F.count("*").alias("dup_windows"),
                F.sum(F.when(F.col("__prev").isNull(), F.lit(w))
                      .otherwise(F.least(F.lit(w),
                                         F.col("pos") - F.col("__prev"))))
                .alias("covered_tokens")))
    return (base.select(id_col, "n_tokens")
            .join(cov, id_col, "left")
            .select(F.col(id_col),
                    F.col("n_tokens"),
                    F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
                    F.coalesce("covered_tokens", F.lit(0))
                     .alias("covered_tokens"),
                    (F.coalesce("covered_tokens", F.lit(0)).cast("double")
                     / F.col("n_tokens")).alias("dup_frac")))


def dup_span_survivors(df: DataFrame, max_frac: float = 0.5, w: int = 5,
                       min_count: int = 2, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Filter form of :func:`dup_span_coverage`: keep documents whose
    duplicated-span coverage is <= ``max_frac`` (the ExactSubstr-style
    'drop memorization-prone docs' gate). Returns the surviving rows of
    ``df`` with all original columns — one broadcast-friendly semi-join
    against the metadata-sized survivor id set."""
    cov = dup_span_coverage(df, w=w, min_count=min_count,
                            text_col=text_col, id_col=id_col)
    keep = cov.filter(F.col("dup_frac") <= float(max_frac)).select(id_col)
    return df.join(keep, id_col, "left_semi")
