"""Deterministic sampling (cpp_parquet_spark.sampling): domain mixing
and holdout splits keyed on md5(id) — the properties Spark's own
``sample()`` cannot give (bit-stability across partitioning, nested
rates, append-stable holdouts) plus a DuckDB cross-check of the
md5-uniform recipe the driver oracles rely on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 7}", f"text {i}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_hash_uniform_matches_duckdb(spark):
    """The Spark U[0,1) and the oracle SQL recipe agree bit-for-bit —
    this equality is what lets every sampler carry a full oracle."""
    df = spark.range(0, 300).select(F.col("id").alias("doc_id"),
                                    sampling.hash_uniform().alias("u"))
    got = {r["doc_id"]: r["u"] for r in df.collect()}
    want = dict(duckdb.sql("""
        SELECT i, CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8)
                        AS BIGINT) / 4294967296.0
        FROM generate_series(0, 299) t(i)""").fetchall())
    assert got == want
    assert all(0.0 <= u < 1.0 for u in got.values())


def test_sample_domains_partition_invariant(docs):
    """Same kept set no matter how the input is partitioned — the
    resume/recluster stability guarantee."""
    rates = {"src0": 0.0, "src1": 0.3, "src2": 1.0}
    a = sorted(r["doc_id"] for r in sampling.sample_domains(docs, rates).collect())
    b = sorted(r["doc_id"] for r in
               sampling.sample_domains(docs.repartition(13, "text"), rates).collect())
    assert a == b
    kept_by_src = {s: [] for s in range(7)}
    for i in a:
        kept_by_src[i % 7].append(i)
    assert kept_by_src[0] == []                       # rate 0 drops all
    assert kept_by_src[2] == [i for i in range(400) if i % 7 == 2]  # rate 1
    assert kept_by_src[3] == [i for i in range(400) if i % 7 == 3]  # default 1.0
    assert 0 < len(kept_by_src[1]) < len([i for i in range(400) if i % 7 == 1])


def test_sample_domains_nested_rates(docs):
    """Kept set at rate r is a subset of kept set at rate r' > r for the
    same domain — tuning a mix down never resurrects dropped rows."""
    lo = {r["doc_id"] for r in
          sampling.sample_domains(docs, {"src1": 0.2}, default_rate=0.0).collect()}
    hi = {r["doc_id"] for r in
          sampling.sample_domains(docs, {"src1": 0.6}, default_rate=0.0).collect()}
    assert lo <= hi and len(lo) < len(hi)


def test_sample_domains_rate_validation(docs):
    with pytest.raises(ValueError):
        sampling.sample_domains(docs, {"src1": 1.5})
    with pytest.raises(ValueError):
        sampling.sample_domains(docs, {"src1": -0.1})


def test_split_holdout_append_stable(spark, docs):
    """A row's split never changes as the corpus grows: the eval ids of
    a prefix corpus are exactly the eval ids of the full corpus
    restricted to the prefix."""
    out_full = sampling.split_holdout(docs, eval_frac=0.15)
    eval_full = {r["doc_id"] for r in
                 out_full.filter(F.col("split") == "eval").collect()}
    prefix = docs.filter(F.col("doc_id") < 150)
    eval_pre = {r["doc_id"] for r in
                sampling.split_holdout(prefix, eval_frac=0.15)
                .filter(F.col("split") == "eval").collect()}
    assert eval_pre == {i for i in eval_full if i < 150}
    # every row gets exactly one split label
    assert out_full.count() == 400
    assert out_full.filter(~F.col("split").isin("eval", "train")).count() == 0
    with pytest.raises(ValueError):
        sampling.split_holdout(docs, eval_frac=2.0)


def test_upsample_domains_copy_semantics(docs):
    """weight w ⇒ floor(w) or ceil(w) copies numbered 1..k, the extra
    copy decided by the salted uniform; weight 0 drops; default 1.0 is
    the identity; all deterministic across repartitioning."""
    w = {"src0": 0.0, "src1": 2.5, "src2": 1.0}
    out = sampling.upsample_domains(docs, w).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r["epoch"])
    for i, eps in by_id.items():
        assert sorted(eps) == list(range(1, len(eps) + 1))
    assert not any(i % 7 == 0 for i in by_id)              # w=0 dropped
    src1 = {i: len(e) for i, e in by_id.items() if i % 7 == 1}
    assert set(src1.values()) <= {2, 3} and len(set(src1.values())) == 2
    mean = sum(src1.values()) / len(src1)
    assert 2.2 < mean < 2.8                                # E[k] = 2.5
    assert all(len(by_id[i]) == 1 for i in by_id if i % 7 in (2, 3))
    again = sampling.upsample_domains(docs.repartition(17, "text"), w)
    assert sorted((r["doc_id"], r["epoch"]) for r in again.collect()) \
        == sorted((r["doc_id"], r["epoch"]) for r in out)
    with pytest.raises(ValueError):
        sampling.upsample_domains(docs, {"src1": -1.0})


def test_upsample_frac_coin_independent_of_keep_coin(docs):
    """The ':up' salt decorrelates the fractional-copy coin from the
    sample_domains keep coin: at rate .5 / weight 1.5 over the same ids
    the two indicator sets differ (they'd be identical unsalted)."""
    kept = {r["doc_id"] for r in
            sampling.sample_domains(docs, {}, default_rate=0.5).collect()}
    extra = {i for i, n in
             ((r["doc_id"], r["epoch"]) for r in
              sampling.upsample_domains(docs, {}, default_weight=1.5)
              .collect()) if n == 2}
    assert kept != extra and kept and extra


def test_shuffle_order_total_order(spark, docs):
    """Global order = md5(id) ascending across partition boundaries,
    reproducible, and not the input order."""
    out = sampling.shuffle_order(docs, partitions=5)
    ids = [r["doc_id"] for r in out.collect()]
    assert len(ids) == 400 and ids != sorted(ids)
    import hashlib
    want = sorted(range(400),
                  key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert ids == want
    keys = [r["shuffle_key"] for r in out.collect()]
    assert keys == sorted(keys)
