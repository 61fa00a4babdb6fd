"""Z-order (Morton) multi-dimension clustering — the Delta
OPTIMIZE ZORDER analogue. Parts hold value-localized rows in EVERY
zorder_on dimension at once, so zone maps prune selective predicates
on ANY of them; range layout prunes only its one column and hash
layout prunes none. Correctness bar: decode identical to source,
pruning effective on BOTH dimensions, parts row-balanced."""

import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark.engine import (decode_table, decode_where,
                                      encode_table, prune_parts)
from cpp_parquet_spark.partitioning import (EncodeConfig, effective_parts,
                                            plan_zorder_bounds, with_part_id)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _zcfg(docs, num_parts=16, bits=8):
    bounds = plan_zorder_bounds(docs, ("doc_id", "n_chars"), bits=bits)
    return EncodeConfig(zorder_on=("doc_id", "n_chars"),
                        zorder_bounds=bounds, zorder_bits=bits,
                        num_parts=num_parts, salt_from=(),
                        order_keys=("doc_id",), table_name="docs_z")


def test_zorder_part_count_and_balance(spark, docs):
    cfg = _zcfg(docs)
    assert effective_parts(cfg) == 16
    ids = (with_part_id(docs, cfg).groupBy("__part_id")
           .count().collect())
    assert len(ids) == 16
    counts = sorted(r["count"] for r in ids)
    # quantile ranks are uniform by construction -> parts balanced
    assert counts[-1] <= 4 * counts[0]
    assert {r["__part_id"] for r in ids} == set(range(16))


def test_zorder_roundtrip_identical(spark, docs):
    src = docs.select("doc_id", "lang", "n_chars", "text")
    pages = encode_table(src, _zcfg(docs))
    out = decode_table(pages, spark)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, src.collect()))


def test_zorder_prunes_both_dimensions(spark, docs):
    src = docs.select("doc_id", "lang", "n_chars")
    pages = encode_table(src, _zcfg(docs)).cache()
    try:
        total = pages.select("part_id").distinct().count()
        assert total == 16
        q = docs.approxQuantile("n_chars", [0.25], 0.001)[0]
        lo_id = docs.agg(F.min("doc_id")).collect()[0][0]
        q_id = docs.approxQuantile("doc_id", [0.25], 0.001)[0]
        surv_a = prune_parts(pages, "doc_id", lo_id, q_id).count()
        surv_b = prune_parts(pages, "n_chars", None, q).count()
        # a one-quartile predicate on EITHER column skips parts; with a
        # 4x4 Morton grid the ideal survivor count is 4 of 16 — allow
        # boundary-part slack but require real pruning on both dims
        assert surv_a <= total // 2, (surv_a, total)
        assert surv_b <= total // 2, (surv_b, total)
        # conjunctive pushdown decode == source filter (both dims)
        got = decode_where(pages, "doc_id", lo_id, q_id, spark,
                           more=[("n_chars", None, q)])
        want = src.filter((F.col("doc_id") >= lo_id)
                          & (F.col("doc_id") <= q_id)
                          & (F.col("n_chars") <= q))
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))
    finally:
        pages.unpersist()


def test_zorder_vs_range_second_dim(spark, docs):
    """The claim that justifies z-order: range layout on doc_id prunes
    nothing for an n_chars predicate; z-order prunes both."""
    from cpp_parquet_spark.partitioning import plan_range_bounds
    src = docs.select("doc_id", "n_chars")
    q = docs.approxQuantile("n_chars", [0.25], 0.001)[0]
    rb = plan_range_bounds(docs, "doc_id", 16)
    rcfg = EncodeConfig(range_on="doc_id", range_bounds=rb, salt_from=(),
                        order_keys=("doc_id",), table_name="docs_r")
    rpages = encode_table(src, rcfg)
    rtotal = rpages.select("part_id").distinct().count()
    rsurv = prune_parts(rpages, "n_chars", None, q).count()
    zpages = encode_table(src, _zcfg(docs))
    zsurv = prune_parts(zpages, "n_chars", None, q).count()
    ztotal = zpages.select("part_id").distinct().count()
    assert rsurv == rtotal          # range layout: no pruning on dim 2
    assert zsurv <= ztotal // 2     # z-order: real pruning on dim 2


def test_zorder_null_and_guard(spark, docs):
    # NULLs land in rank 0 / part 0 and survive the roundtrip
    src = (docs.select("doc_id", "n_chars")
           .withColumn("n_chars", F.when(F.col("doc_id") % 7 == 0, None)
                       .otherwise(F.col("n_chars"))))
    pages = encode_table(src, _zcfg(src))
    out = decode_table(pages, spark)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, src.collect()))
    with pytest.raises(ValueError, match="Morton"):
        cfg = EncodeConfig(zorder_on=("doc_id", "n_chars"),
                           zorder_bounds=((1,), (1,)), zorder_bits=32,
                           num_parts=16, salt_from=())
        with_part_id(src, cfg).collect()
