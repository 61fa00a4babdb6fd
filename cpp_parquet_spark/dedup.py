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
                        scope: str = "source", prefix: int = 512) -> DataFrame:
    """Exact Jaccard similarity over n-gram sets for all same-scope pairs
    with J >= threshold. explode -> equi-join on (scope, gram) ->
    count = |A ∩ B|; |A ∪ B| = |A|+|B|-|A ∩ B|."""
    sh = shingles(df, n, text_col, id_col, scope, prefix)
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

_P61 = (1 << 61) - 1  # Mersenne prime for the permutation family


def _perm_coeffs(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P61, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _P61, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(texts: pd.Series, n: int, prefix: int) -> list[np.ndarray]:
    """Per doc: uint64 hashes of its distinct char n-grams (vectorized:
    one polynomial-hash pass over the concatenated bytes of the batch)."""
    clipped = texts.fillna("").str.slice(0, prefix)
    data = clipped.str.encode("utf-8")
    lens = data.str.len().to_numpy(dtype=np.int64)
    flat = np.frombuffer(b"".join(data.tolist()), dtype=np.uint8)
    # rolling polynomial hash of width n at every byte offset
    h = np.zeros(max(flat.shape[0] - n + 1, 0), dtype=np.uint64)
    if h.shape[0]:
        mul = np.uint64(1099511628211)        # FNV-ish odd multiplier
        acc = np.zeros_like(h)
        for k in range(n):                     # loop over n (tiny), not rows
            acc = acc * mul + flat[k: k + h.shape[0]].astype(np.uint64)
        h = acc
    out: list[np.ndarray] = []
    offs = np.zeros(lens.shape[0] + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    for i in range(lens.shape[0]):
        lo, hi = offs[i], max(offs[i + 1] - n + 1, offs[i])
        out.append(np.unique(h[lo:hi]) if hi > lo else
                   np.zeros(1, dtype=np.uint64))
    return out


def minhash_signatures(df: DataFrame, num_perm: int = 64, n: int = 4,
                       bands: int = 16, text_col: str = "text",
                       id_col: str = "doc_id", prefix: int = 512,
                       seed: int = 42) -> DataFrame:
    """(id, band, sig) rows: the banded MinHash signature, one row per
    band — ready for the LSH bucket join. numpy-vectorized mapInPandas."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    a, b = _perm_coeffs(num_perm, seed)
    p = np.uint64(_P61)

    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("sig", T.StringType()),
    ])

    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            per_doc = _shingle_hashes(pdf[text_col], n, prefix)
            recs = {"id": [], "band": [], "sig": []}
            for i, hs in enumerate(per_doc):
                # minhash: min over shingles of (a*h + b) mod p, per perm
                v = (hs[:, None] * a[None, :] + b[None, :]) % p
                sig = v.min(axis=0)            # uint64[num_perm]
                sb = sig.astype("<u8").tobytes()
                step = 8 * rows_per_band
                for bi in range(bands):
                    recs["id"].append(int(ids[i]))
                    recs["band"].append(bi)
                    recs["sig"].append(sb[bi * step:(bi + 1) * step].hex())
            yield pd.DataFrame(recs)

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def lsh_candidates(sigs: DataFrame) -> DataFrame:
    """Distinct candidate pairs from the band-bucket equi-join."""
    a, b = sigs.alias("a"), sigs.alias("b")
    return (a.join(b, [F.col("a.band") == F.col("b.band"),
                       F.col("a.sig") == F.col("b.sig"),
                       F.col("a.id") < F.col("b.id")])
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def minhash_dedup_pairs(df: DataFrame, threshold: float = 0.7,
                        num_perm: int = 64, n: int = 4, bands: int = 16,
                        text_col: str = "text", id_col: str = "doc_id",
                        prefix: int = 512, seed: int = 42) -> DataFrame:
    """MinHash-LSH candidates verified with exact n-gram Jaccard.

    Scale shape: signatures are linear in input, the bucket join touches
    only colliding bands, and the exact verify runs on candidates only."""
    sigs = minhash_signatures(df, num_perm, n, bands, text_col, id_col,
                              prefix, seed)
    cand = lsh_candidates(sigs)
    sh = shingles(df, n, text_col, id_col, scope=id_col, prefix=prefix) \
        .drop("scope")
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


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """64-bit SimHash from whitespace tokens, entirely in SQL expressions:
    explode tokens -> xxhash64(token) -> per-bit +/-1 votes -> sign bits.

    No Python at all — whole-stage codegen end to end, one shuffle
    (the groupBy on id)."""
    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                       .alias("tok"))
            .withColumn("h", F.xxhash64(F.col("tok"), F.lit(seed))))
    votes = [F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1,
                          1).otherwise(-1)).alias(f"v{i}")
             for i in range(64)]
    agg = toks.groupBy("id").agg(*votes)
    sh = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sh = term if sh is None else sh.bitwiseXOR(term)
    return agg.select("id", sh.alias("simhash"))


def simhash_pairs(df: DataFrame, max_hamming: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  seed: int = 42) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Block-LSH prefilter: split the 64-bit hash into 4 16-bit blocks; any
    pair within hamming <= 3 shares a block exactly (pigeonhole), and for
    larger budgets the block join is still the candidate generator that
    keeps the compare sub-quadratic at scale."""
    sh = simhash(df, text_col, id_col, seed)
    blocks = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftright("simhash", 16 * i)
                      .bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for i in range(4)])).alias("bk"))
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
