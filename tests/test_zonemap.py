"""Zone maps (per-page min/max) + predicate-pushdown decode.

Parquet-statistics-style pruning (parquet.thrift:882-889 semantics):
every page row carries a conservative [min_v, max_v] in canonical text
form; `decode_where` skips whole parts whose zones cannot intersect the
predicate and applies the residual filter post-decode. Correctness bar:
decode_where == full decode + filter on every type family, including
the conservative cases (nulls, long strings, binary) where pruning must
not drop rows.
"""

import datetime

import pyarrow as pa
import pytest
from pyspark.sql import Row, functions as F

from cpp_parquet_spark.codecs import pagecodec
from cpp_parquet_spark.engine import (decode_table, decode_where,
                                      encode_table, prune_parts)
from cpp_parquet_spark.partitioning import EncodeConfig


# ---------------------------------------------------------------------------
# kernel-level: page_minmax canonical forms
# ---------------------------------------------------------------------------

def test_page_minmax_ints():
    arr = pa.array([5, 1, None, 9], type=pa.int64())
    assert pagecodec.page_minmax(arr, "i64") == ("1", "9")


def test_page_minmax_floats_and_nan():
    arr = pa.array([0.5, -2.25, 3.0], type=pa.float64())
    mn, mx = pagecodec.page_minmax(arr, "f64")
    assert (float(mn), float(mx)) == (-2.25, 3.0)
    assert pagecodec.page_minmax(
        pa.array([1.0, float("nan")], type=pa.float64()), "f64") == (None, None)
    assert pagecodec.page_minmax(
        pa.array([1.0, float("inf")], type=pa.float64()), "f64") == (None, None)


def test_page_minmax_strings_and_cap():
    arr = pa.array(["b", "a", "c"], type=pa.large_string())
    assert pagecodec.page_minmax(arr, "str") == ("a", "c")
    long = "z" * (pagecodec.ZONE_STR_MAX + 1)
    assert pagecodec.page_minmax(
        pa.array(["a", long], type=pa.large_string()), "str") == (None, None)


def test_page_minmax_unknown_families():
    assert pagecodec.page_minmax(
        pa.array([b"ab"], type=pa.large_binary()), "bin") == (None, None)
    assert pagecodec.page_minmax(
        pa.array([None, None], type=pa.int64()), "i64") == (None, None)
    arr = pa.array([[1.0, 2.0]], type=pa.list_(pa.float32()))
    assert pagecodec.page_minmax(arr, "arrf32") == (None, None)


def test_page_minmax_timestamp_micros():
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    arr = pa.array([ts], type=pa.timestamp("us"))
    mn, mx = pagecodec.page_minmax(arr, "ts")
    want = int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert int(mn) == int(mx) == want


# ---------------------------------------------------------------------------
# engine-level: pruned decode == decode + filter
# ---------------------------------------------------------------------------

CFG = EncodeConfig(keys=("k",), salt_from=(), num_parts=8,
                   order_keys=("k",), table_name="zt")


@pytest.fixture()
def parted(spark):
    """8 parts keyed on k; v ranges are disjoint per k => zones prune."""
    rows = [Row(k=i % 8, v=float(i % 8) * 100 + j, s=f"s{i % 8:02d}",
                n=None if j == 0 else i)
            for i in range(64) for j in range(20)]
    return spark.createDataFrame(rows)


def _assert_same(a, b, cols=("k", "v", "s")):
    sa = sorted(map(tuple, a.select(*cols).collect()))
    sb = sorted(map(tuple, b.select(*cols).collect()))
    assert sa == sb


def test_decode_where_matches_filter_numeric(spark, parted):
    pages = encode_table(parted, CFG).cache()
    try:
        got = decode_where(pages, "v", lo=150.0, hi=420.0)
        want = decode_table(pages).filter(
            (F.col("v") >= 150.0) & (F.col("v") <= 420.0))
        _assert_same(got, want)
    finally:
        pages.unpersist()


def test_decode_where_prunes_parts(spark, parted):
    pages = encode_table(parted, CFG).cache()
    try:
        total = pages.select("part_id").distinct().count()
        kept = prune_parts(pages, "v", lo=150.0, hi=420.0).count()
        assert kept < total  # disjoint per-part v ranges => real pruning
        # an impossible range prunes everything and returns zero rows
        assert prune_parts(pages, "v", lo=1e9).count() == 0
        assert decode_where(pages, "v", lo=1e9).count() == 0
    finally:
        pages.unpersist()


def test_decode_where_string_zone(spark, parted):
    pages = encode_table(parted, CFG).cache()
    try:
        got = decode_where(pages, "s", lo="s03", hi="s05")
        want = decode_table(pages).filter(F.col("s").between("s03", "s05"))
        _assert_same(got, want)
        assert prune_parts(pages, "s", lo="s03", hi="s05").count() < 8
    finally:
        pages.unpersist()


def test_decode_dataset_where_durable(spark, parted, tmp_path):
    """Pushdown through the on-disk pages+manifest layer."""
    from cpp_parquet_spark.engine import decode_dataset, run_encode
    dst = str(tmp_path / "zt")
    run_encode(spark, parted, dst, CFG)
    got = decode_dataset(spark, dst, where=("v", 150.0, 420.0))
    want = decode_dataset(spark, dst).filter(
        (F.col("v") >= 150.0) & (F.col("v") <= 420.0))
    _assert_same(got, want)


def test_range_clustered_layout_prunes(spark, parted):
    """Range mode: parts hold contiguous v ranges => zones actually
    prune; hash mode spreads ranges everywhere and cannot. Results match
    the unpruned filter either way."""
    from cpp_parquet_spark.partitioning import (effective_parts,
                                                plan_range_bounds)
    bounds = plan_range_bounds(parted, "v", 8)
    cfg = EncodeConfig(range_on="v", range_bounds=bounds,
                       salt_from=(), order_keys=("v",), table_name="zr")
    assert effective_parts(cfg) == 8
    pages = encode_table(parted, cfg).cache()
    try:
        total = pages.select("part_id").distinct().count()
        kept = prune_parts(pages, "v", lo=150.0, hi=220.0).count()
        assert kept < total / 2
        got = decode_where(pages, "v", lo=150.0, hi=220.0)
        want = decode_table(pages).filter(F.col("v").between(150.0, 220.0))
        _assert_same(got, want)
    finally:
        pages.unpersist()


def test_range_clustered_string_and_salt(spark, parted):
    """String bounds via the ntile path + within-range salting: fan-out
    multiplies parts, zones stay narrow, rows survive intact."""
    from cpp_parquet_spark.partitioning import (effective_parts,
                                                plan_range_bounds)
    bounds = plan_range_bounds(parted, "s", 4)
    cfg = EncodeConfig(range_on="s", range_bounds=bounds,
                       salt_from=("v",), salt_buckets=3,
                       order_keys=("s",), table_name="zs")
    assert effective_parts(cfg) == 4 * 3
    pages = encode_table(parted, cfg).cache()
    try:
        assert decode_table(pages).count() == parted.count()
        got = decode_where(pages, "s", lo="s02", hi="s04")
        want = decode_table(pages).filter(F.col("s").between("s02", "s04"))
        _assert_same(got, want)
        kept = prune_parts(pages, "s", lo="s02", hi="s04").count()
        assert kept < 12
    finally:
        pages.unpersist()


def test_range_part_assignment_deterministic_and_null_safe(spark):
    from cpp_parquet_spark.partitioning import with_part_id
    rows = [Row(k=0, v=None if i % 5 == 0 else float(i), s="x", n=i)
            for i in range(50)]
    df = spark.createDataFrame(rows)
    cfg = EncodeConfig(range_on="v", range_bounds=(11.0, 26.0, 41.0),
                       salt_from=(), table_name="zd")
    a = sorted(map(tuple, with_part_id(df, cfg).select("n", "__part_id").collect()))
    b = sorted(map(tuple, with_part_id(df, cfg).select("n", "__part_id").collect()))
    assert a == b
    pid = dict((n, p) for n, p in a)
    assert pid[0] == 0          # NULL v -> bucket 0 (NULLS FIRST)
    assert pid[1] == 0 and pid[12] == 1 and pid[27] == 2 and pid[42] == 3
    assert pid[11] == 0 and pid[26] == 1 and pid[41] == 2  # bounds inclusive


def test_decode_where_conjunction(spark, parted):
    """Multi-predicate AND: surviving-part sets intersect, every
    residual applies."""
    pages = encode_table(parted, CFG).cache()
    try:
        got = decode_where(pages, "v", lo=150.0, hi=520.0,
                           more=[("s", "s02", "s04")])
        want = decode_table(pages).filter(
            F.col("v").between(150.0, 520.0) &
            F.col("s").between("s02", "s04"))
        _assert_same(got, want)
    finally:
        pages.unpersist()


def test_scan_column_page_level_pruning(spark, parted):
    """scan_column decodes only the predicate column's overlapping
    pages; with order_keys on that column, page zones are narrow even
    under hash layout, so the hot-page count drops."""
    from cpp_parquet_spark.engine import scan_column
    cfg = EncodeConfig(keys=("k",), salt_from=(), num_parts=8,
                       order_keys=("v",), page_rows_max=64,
                       table_name="zc")
    pages = encode_table(parted, cfg).cache()
    try:
        got = sorted(x["v"] for x in
                     scan_column(pages, "v", lo=150.0, hi=420.0).collect())
        want = sorted(x["v"] for x in decode_table(pages)
                      .filter(F.col("v").between(150.0, 420.0)).collect())
        assert got == want
        gs = sorted(x["s"] for x in
                    scan_column(pages, "s", lo="s03", hi="s05").collect())
        ws = sorted(x["s"] for x in decode_table(pages)
                    .filter(F.col("s").between("s03", "s05")).collect())
        assert gs == ws
    finally:
        pages.unpersist()


def test_decode_where_null_column_conservative(spark, parted):
    """Half-open predicate over a column with nulls: null rows drop via
    the residual filter (SQL semantics), none via pruning."""
    pages = encode_table(parted, CFG).cache()
    try:
        got = decode_where(pages, "n", lo=100)
        want = decode_table(pages).filter(F.col("n") >= 100)
        _assert_same(got, want, cols=("k", "v", "n"))
    finally:
        pages.unpersist()


# ---------------------------------------------------------------------------
# bloom filters (equality pruning — parquet BloomFilter analogue)
# ---------------------------------------------------------------------------

def test_bloom_eq_prune_and_decode(spark, sf_dir):
    from dataclasses import replace
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import (decode_where_eq, encode_table,
                                          eq_prune)
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=8,
                       order_keys=("doc_id",),
                       bloom_cols=("doc_id", "source"),
                       table_name="documents")
    pages = encode_table(df, cfg).cache()
    try:
        total_parts = pages.select("part_id").distinct().count()
        # int point lookup: present value decodes exactly, absent prunes
        want = [tuple(r) for r in
                df.filter(F.col("doc_id") == 42).collect()]
        got = [tuple(r) for r in
               decode_where_eq(pages, "doc_id", 42).collect()]
        assert sorted(got) == sorted(want) and len(got) == 1
        assert decode_where_eq(pages, "doc_id", -99999).count() == 0
        # absent key: bloom fp rate at 16 KiB / ~60 values per part is
        # ~0, so pruning should drop essentially every part
        assert eq_prune(pages, "doc_id", -99999).count() <= total_parts // 2
        # string point lookup on the partition key: most parts pruned
        src = df.select("source").first()["source"]
        cand = eq_prune(pages, "source", src).count()
        assert 1 <= cand < total_parts
        got_s = decode_where_eq(pages, "source", src).count()
        assert got_s == df.filter(F.col("source") == src).count()
    finally:
        pages.unpersist()


def test_bloom_in_list_prune(spark, sf_dir):
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import (decode_where_in, encode_table,
                                          in_prune)
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=8,
                       order_keys=("doc_id",), bloom_cols=("doc_id",),
                       table_name="documents")
    pages = encode_table(df, cfg).cache()
    try:
        ids = [7, 42, 99, -5]                 # -5 absent
        want = sorted(tuple(r) for r in
                      df.filter(F.col("doc_id").isin(ids)).collect())
        got = sorted(tuple(r) for r in
                     decode_where_in(pages, "doc_id", ids).collect())
        assert got == want and len(got) == 3
        total = pages.select("part_id").distinct().count()
        assert in_prune(pages, "doc_id", [-5]).count() <= total // 2
    finally:
        pages.unpersist()


def test_bloom_fallback_without_index(spark, sf_dir):
    """A column NOT in bloom_cols must fall back to a full decode —
    an absent index means scan, never an empty result."""
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import decode_where_eq, encode_table
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=4,
                       order_keys=("doc_id",), table_name="documents")
    pages = encode_table(df, cfg)
    got = decode_where_eq(pages, "doc_id", 42).count()
    assert got == df.filter(F.col("doc_id") == 42).count() == 1


def test_bloom_survives_compaction(spark, sf_dir, tmp_path):
    """Compaction moves bloom sidecar rows with their pages; a bin then
    carries one bloom row per source part and a point lookup still
    admits the bin iff ANY source bloom matches."""
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import (compact_parts, decode_where_eq,
                                          read_committed_pages, run_encode)
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dst = str(tmp_path / "ds_bloom")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=8,
                       order_keys=("doc_id",), bloom_cols=("doc_id",),
                       table_name="documents")
    run_encode(spark, df, dst, cfg)
    assert compact_parts(spark, dst, min_bytes=1 << 30)["bins"] >= 1
    pages = read_committed_pages(spark, dst)
    got = [tuple(r) for r in decode_where_eq(pages, "doc_id", 42).collect()]
    want = [tuple(r) for r in df.filter(F.col("doc_id") == 42).collect()]
    assert sorted(got) == sorted(want) and len(got) == 1
    assert decode_where_eq(pages, "doc_id", -77777).count() == 0
    # survivor contract is a SET: a bin holds several source-part bloom
    # rows, multiple of which can match — in_prune must dedupe so
    # count() reads as "parts scanned", never exceeding the live parts
    from cpp_parquet_spark.engine import in_prune
    surv = in_prune(pages, "doc_id", list(range(50))).collect()
    assert len(surv) == len({(r["part_id"], r["run_id"]) for r in surv})
    live = pages.select("part_id", "run_id").distinct().count()
    assert len(surv) <= live


def test_decode_where_all_pruned_no_hint(spark, sf_dir, tmp_path):
    """A range predicate outside every zone, on pages read back from
    disk (no _cps_columns hint), must return an EMPTY relation with the
    full schema — not an unresolvable-column error."""
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import (decode_where,
                                          read_committed_pages, run_encode)
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dst = str(tmp_path / "ds_zone")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=4,
                       order_keys=("doc_id",), table_name="documents")
    run_encode(spark, df, dst, cfg)
    pages = read_committed_pages(spark, dst)
    out = decode_where(pages, "doc_id", lo=10_000_000, hi=20_000_000)
    assert out.count() == 0
    assert set(out.columns) == set(df.columns)


def test_bloom_partial_index_scans_unindexed_parts(spark, sf_dir, tmp_path):
    """Index absence must mean "scan" PER PART: a dataset first encoded
    without bloom_cols then appended to WITH them has bloom rows for only
    the later parts. Point lookups must still return rows that live in the
    unindexed parts (never silently drop them)."""
    from dataclasses import replace
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import (decode_where_eq,
                                          read_committed_pages, run_encode)
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lo = df.filter(F.col("doc_id") < 100)      # first run: NO bloom
    hi = df.filter(F.col("doc_id") >= 100)     # second run: bloom on doc_id
    dst = str(tmp_path / "ds_partial_bloom")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=4,
                       order_keys=("doc_id",), table_name="documents")
    run_encode(spark, lo, dst, cfg, resume=False)
    run_encode(spark, hi, dst, replace(cfg, bloom_cols=("doc_id",)),
               resume=False)
    pages = read_committed_pages(spark, dst)
    # value in the UNINDEXED half: the part has no bloom row for doc_id,
    # so it must survive pruning and the row must come back
    got_lo = [tuple(r) for r in decode_where_eq(pages, "doc_id", 42).collect()]
    want_lo = [tuple(r) for r in df.filter(F.col("doc_id") == 42).collect()]
    assert sorted(got_lo) == sorted(want_lo) and len(got_lo) == 1
    # value in the INDEXED half still works (and its absent-key pruning too)
    got_hi = decode_where_eq(pages, "doc_id", 142).count()
    assert got_hi == df.filter(F.col("doc_id") == 142).count() == 1
    assert decode_where_eq(pages, "doc_id", -12345).count() == 0


def test_bloom_mixed_m_values_no_false_negatives(spark, sf_dir, tmp_path):
    """bloom_bits changed between appends -> rows with different m share a
    kernel batch; each row must be probed at ITS OWN m or bit positions go
    wrong and a present value is silently dropped (bloom false negative)."""
    from dataclasses import replace
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import (decode_where_in,
                                          read_committed_pages, run_encode)
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lo = df.filter(F.col("doc_id") < 100)
    hi = df.filter(F.col("doc_id") >= 100)
    dst = str(tmp_path / "ds_mixed_m")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=4,
                       order_keys=("doc_id",), bloom_cols=("doc_id",),
                       bloom_bits=1 << 12, table_name="documents")
    run_encode(spark, lo, dst, cfg, resume=False)
    run_encode(spark, hi, dst, replace(cfg, bloom_bits=1 << 17),
               resume=False)
    pages = read_committed_pages(spark, dst)
    ids = [7, 42, 150, 250]                    # values from BOTH m-regimes
    want = sorted(tuple(r) for r in
                  df.filter(F.col("doc_id").isin(ids)).collect())
    got = sorted(tuple(r) for r in
                 decode_where_in(pages, "doc_id", ids).collect())
    assert got == want and len(got) == 4


def test_in_prune_empty_list_and_bad_types(spark, sf_dir):
    import pytest as _pytest
    from cpp_parquet_spark.engine import encode_table, in_prune
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=4,
                       order_keys=("doc_id",), bloom_cols=("doc_id",),
                       table_name="documents")
    pages = encode_table(df, cfg)
    assert in_prune(pages, "doc_id", []).count() == 0
    with _pytest.raises(TypeError):
        in_prune(pages, "doc_id", [1.5])
    with _pytest.raises(TypeError):
        in_prune(pages, "doc_id", [1, "x"])
    with _pytest.raises(TypeError):
        in_prune(pages, "doc_id", [True])


def test_in_prune_accepts_numpy_integers(spark, sf_dir):
    """Probe keys often come from numpy/pandas (np.int64) — the type
    gate must accept Integral, not just builtin int."""
    import numpy as np
    from cpp_parquet_spark.engine import (decode_where_eq, encode_table,
                                          in_prune)
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=4,
                       order_keys=("doc_id",), bloom_cols=("doc_id",),
                       table_name="documents")
    pages = encode_table(df, cfg)
    assert in_prune(pages, "doc_id", [np.int64(42)]).count() >= 1
    got = decode_where_eq(pages, "doc_id", np.int64(42)).count()
    assert got == 1
    import pytest as _pytest
    with _pytest.raises(TypeError):
        in_prune(pages, "doc_id", [np.bool_(True)])


def test_column_stats_fast_metadata_only(spark, sf_dir, tmp_path):
    """count/min/max from zone metadata: exact vs the source, and the
    parquet scan never reads the data blob column. Deletes and unknown
    zones blank the non-exact fields instead of lying."""
    from pyspark.sql import functions as F

    from cpp_parquet_spark.engine import (EncodeConfig, column_stats_fast,
                                          delete_where_in, read_live_pages,
                                          run_encode)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dst = str(tmp_path / "fs")
    cfg = EncodeConfig(keys=("l_returnflag",), salt_from=("l_orderkey",),
                       num_parts=4, order_keys=("l_orderkey",),
                       bloom_cols=("l_orderkey",), table_name="li")
    run_encode(spark, li, dst, cfg, run_id="r1", resume=False)
    pages = read_live_pages(spark, dst)
    for col in ("l_quantity", "l_orderkey", "l_shipdate"):
        r = column_stats_fast(pages, col).collect()[0]
        s = li.agg(F.count(col), F.min(col), F.max(col)).collect()[0]
        assert r["n"] == s[0], col
        if col == "l_shipdate":       # zone domain = epoch micros
            eps = li.agg(
                F.unix_micros(F.min(col).cast("timestamp")),
                F.unix_micros(F.max(col).cast("timestamp"))).collect()[0]
            assert (r["min_v"], r["max_v"]) == (eps[0], eps[1]), col
        else:
            assert (r["min_v"], r["max_v"]) == (s[1], s[2]), col
    # plan: metadata columns only — the heavy `data` blob is pruned
    plan = column_stats_fast(pages, "l_quantity") \
        ._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all(
        "data" not in ln.split("ReadSchema")[1] for ln in scan_lines), plan
    # deletes blank min/max (a deleted row could be the extremum) but
    # keep the count exact on a null-free column
    delete_where_in(spark, dst, "l_orderkey",
                    [int(li.select("l_orderkey").first()[0])])
    pages2 = read_live_pages(spark, dst)
    r2 = column_stats_fast(pages2, "l_quantity").collect()[0]
    n_del = li.filter(
        li.l_orderkey == li.select("l_orderkey").first()[0]).count()
    assert r2["n"] == li.count() - n_del
    assert r2["min_v"] is None and r2["max_v"] is None


# ---------------------------------------------------------------------------
# round 4: decimal zones (scaled decimal text, decimal(38, s) compare domain)
# ---------------------------------------------------------------------------

def test_page_minmax_decimals():
    import decimal
    D = decimal.Decimal
    arr = pa.array([D("1.25"), D("-3.50"), None, D("7.00")],
                   pa.decimal128(10, 2))
    assert pagecodec.page_minmax(arr, "dec:10:2") == ("-3.50", "7.00")
    wide = pa.array([D(10**20), D(-5 * 10**19), None], pa.decimal128(38, 0))
    assert pagecodec.page_minmax(wide, "dec38:38:0") == \
        ("-50000000000000000000", "100000000000000000000")
    # all-null stays unknown
    assert pagecodec.page_minmax(
        pa.array([None, None], pa.decimal128(10, 2)), "dec:10:2") \
        == (None, None)


def test_decimal_pushdown_prunes_and_matches(spark):
    """Range-clustered decimal column: a selective price range must PRUNE
    parts (not just filter rows) and decode_where == decode + filter."""
    from cpp_parquet_spark.partitioning import plan_range_bounds
    df = (spark.range(0, 20000)
          .select(F.col("id"),
                  F.expr("CAST(id AS DECIMAL(14,2)) / 100").alias("price"),
                  F.expr("CAST(CAST(id AS DECIMAL(38,6)) * "
                         "CAST(100000000000000 AS DECIMAL(15,0)) "
                         "AS DECIMAL(38,6))").alias("wide")))
    bounds = plan_range_bounds(df, "id", 8)
    cfg = EncodeConfig(range_on="id", range_bounds=bounds, salt_from=(),
                       order_keys=("id",), table_name="zdec")
    pages = encode_table(df, cfg).cache()
    try:
        pages.count()
        total = pages.select("part_id").distinct().count()
        kept = prune_parts(pages, "price", lo="50.00", hi="60.00").count()
        assert kept < total, (kept, total)     # zones actually pruned
        got = decode_where(pages, "price", lo="50.00", hi="60.00",
                           spark=spark)
        want = df.filter((F.col("price") >= 50) & (F.col("price") <= 60))
        assert got.count() == want.count() == 1001
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # wide-decimal (dec38) zones prune too
        kept_w = prune_parts(pages, "wide",
                             lo="500000000000000000.000000",
                             hi="600000000000000000.000000").count()
        assert kept_w < total, (kept_w, total)
    finally:
        pages.unpersist()


def test_decimal_metadata_minmax(spark):
    """column_stats_fast / column_agg_fast return typed decimal extrema
    from zones alone (previously decimals always came back NULL)."""
    import decimal
    from cpp_parquet_spark.engine import column_agg_fast
    df = (spark.range(0, 5000)
          .select(F.col("id"),
                  F.expr("CAST(id AS DECIMAL(14,2)) / 4").alias("d")))
    cfg = EncodeConfig(keys=("id",), salt_from=(), num_parts=4,
                       order_keys=("id",), table_name="zdm")
    pages = encode_table(df, cfg)
    r = column_agg_fast(pages, "d").collect()[0]
    assert r["min_v"] == decimal.Decimal("0")
    assert r["max_v"] == decimal.Decimal("1249.75")
    assert r["sum_v"] == decimal.Decimal("3124375.00")
    assert r["n"] == 5000
