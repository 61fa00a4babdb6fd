"""Cluster-level sampling stats pass + codec decisions (stats.py; north
rule's "sampling-based codec-selection pass")."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cpp_parquet_spark import stats
from cpp_parquet_spark.engine import decode_table, encode_table, verify_roundtrip
from cpp_parquet_spark.partitioning import EncodeConfig
from cpp_parquet_spark.synth import fixture_path

CFG = EncodeConfig(keys=("repo",), salt_from=("path",), num_parts=8,
                   order_keys=("path",), table_name="repofiles")


@pytest.fixture(scope="module")
def repofiles(spark):
    return spark.read.parquet(fixture_path("sf0.001")).cache()


def test_column_stats_sanity(spark, repofiles):
    st = stats.column_stats(repofiles, CFG, fraction=1.0).cache()
    rows = {(r["part_id"], r["column"]): r for r in st.collect()}
    assert len({p for p, _ in rows}) == CFG.num_parts
    for (p, c), r in rows.items():
        assert r["n_values"] > 0
        assert r["ndv"] <= r["n_values"]
        assert r["mean_run"] >= 1.0
    # source code: compressible byte distribution, far under random (8.0)
    content = [r for (_, c), r in rows.items() if c == "content"]
    assert all(2.0 < r["byte_entropy"] < 6.2 for r in content)
    # lang: tiny cardinality in every part
    lang = [r for (_, c), r in rows.items() if c == "lang"]
    assert all(r["ndv"] <= 10 for r in lang)
    st.unpersist()


def test_decisions_deterministic_and_sensible(spark, repofiles):
    p1 = stats.plan_decisions(spark, repofiles, CFG, fraction=0.5)
    p2 = stats.plan_decisions(spark, repofiles, CFG, fraction=0.5)
    assert p1 == p2                       # resume-stable (M5 hard part #3)
    codecs_by_col: dict[str, set] = {}
    for (_, col), codec in p1.items():
        codecs_by_col.setdefault(col, set()).add(codec)
    assert codecs_by_col["content"] == {"fsst"}
    assert codecs_by_col["lang"] <= {"dict", "rle"}
    assert codecs_by_col["repo"] <= {"dict", "rle"}


def test_encode_with_plan_roundtrips(spark, repofiles):
    plan = stats.plan_decisions(spark, repofiles, CFG, fraction=1.0)
    pages = encode_table(repofiles, CFG, plan=plan).cache()
    # pages must use the planned codec for every planned chunk
    used = {(r["part_id"], r["column"]): r["codecs"] for r in
            (pages.filter(F.col("col_idx") >= 0)
             .groupBy("part_id", "column")
             .agg(F.array_sort(F.collect_set("codec")).alias("codecs"))
             .collect())}
    for key, codec in plan.items():
        if key in used and codec != "fsst":   # fsst may fall back per page
            assert used[key] == [codec], (key, codec, used[key])
    decoded = decode_table(pages, columns=[("repo", "str"), ("path", "str"),
                                           ("commit", "str"), ("lang", "str"),
                                           ("content", "str")])
    res = verify_roundtrip(repofiles, decoded, "content")
    assert res["sha256_match_rate"] == 1.0
    pages.unpersist()


def test_int_decisions_on_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cfg = EncodeConfig(keys=("l_returnflag",), salt_from=("l_orderkey",),
                       num_parts=4, order_keys=("l_orderkey", "l_linenumber"),
                       table_name="lineitem")
    plan = stats.plan_decisions(spark, li, cfg, fraction=1.0)
    by_col: dict[str, set] = {}
    for (_, col), codec in plan.items():
        by_col.setdefault(col, set()).add(codec)
    # narrow int ranges must never pick plain
    assert by_col["l_linenumber"] <= {"for", "rle", "dict", "delta"}
    assert by_col["l_quantity"] <= {"for", "rle", "dict", "delta", "dfloat"}
    # sorted-within-part orderkey: FOR/delta-friendly narrow span
    assert "plain" not in by_col["l_orderkey"]


def test_prefix_frac_and_plan(spark):
    """Sorted high-card path column: the sampled prefix_frac is high and
    the plan-level decision is 'prefix'; the unsorted copy of the same
    values stays off the prefix rule."""
    import pandas as pd
    from cpp_parquet_spark.partitioning import EncodeConfig
    from cpp_parquet_spark.stats import column_stats, decide_codecs
    import hashlib
    tails = [hashlib.sha256(str(i).encode()).hexdigest()[:24]
             for i in range(4000)]
    paths = ["shared/deep/project/tree/" + t for t in tails]
    # negative control: high-entropy tails only, no shared prefix, and
    # hash-ordered so the row sort on `path` leaves them unordered
    pdf = pd.DataFrame({"grp": ["g"] * 4000, "path": paths,
                        "rnd": sorted(tails, key=lambda t: t[::-1])})
    df = spark.createDataFrame(pdf)
    cfg = EncodeConfig(keys=("grp",), salt_from=(), num_parts=1,
                       order_keys=("path",), table_name="pp")
    st = column_stats(df, cfg, fraction=1.0).cache()
    try:
        rows = {r["column"]: r for r in st.collect()}
        assert rows["path"]["prefix_frac"] > 0.4
        dec = {(r["part_id"], r["column"]): r["codec"]
               for r in decide_codecs(st).collect()}
        assert dec[(0, "path")] == "prefix"
        # 'rnd' holds the same values unsorted: adjacency gone
        assert rows["rnd"]["prefix_frac"] < 0.4
        assert dec[(0, "rnd")] != "prefix"
    finally:
        st.unpersist()


def test_decide_codecs_block_codec_flips_float_fallback(spark):
    """With an E9 block codec configured the plan routes high-cardinality
    non-decimal floats to bss and float arrays to listb; without it the
    same stats yield plain/listf (bss is size-neutral alone)."""
    import numpy as np
    import pandas as pd
    from cpp_parquet_spark.partitioning import EncodeConfig
    from cpp_parquet_spark.stats import column_stats, decide_codecs
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "grp": ["g"] * 2000,
        "noise": 3.0 + rng.standard_normal(2000),      # non-decimal floats
        "price": np.round(rng.random(2000) * 90 + 1, 2),   # decimal-like
        "vec": [rng.standard_normal(8).astype(np.float32).tolist()
                for _ in range(2000)],
    })
    df = spark.createDataFrame(pdf)
    cfg = EncodeConfig(keys=("grp",), salt_from=(), num_parts=1,
                       order_keys=(), table_name="fb")
    st = column_stats(df, cfg, fraction=1.0).cache()
    try:
        base = {r["column"]: r["codec"] for r in decide_codecs(st).collect()}
        blk = {r["column"]: r["codec"]
               for r in decide_codecs(st, block_codec="zstd").collect()}
        assert base["noise"] == "plain" and blk["noise"] == "bss"
        assert base["vec"] == "listf" and blk["vec"] == "listb"
        # decimal-like floats keep dfloat either way
        assert base["price"] == "dfloat" and blk["price"] == "dfloat"
    finally:
        st.unpersist()
