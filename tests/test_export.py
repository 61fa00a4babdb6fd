"""export_parquet: the distributed standard-parquet sink.

Executor-side files from OUR writer must be consumed bit-exactly by
three independent readers — Spark's JVM parquet-java, pyarrow's C++
reader, and DuckDB — and carry our Statistics + PageIndex sidecars."""

import glob
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from cpp_parquet_spark.export import export_parquet


def _fingerprint(df):
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("N"))
            for c in df.columns]
    h = F.sha2(F.concat_ws("|", *cols).cast("binary"), 256)
    return (df.select(h.alias("h"))
            .agg(F.bit_xor(F.conv(F.substring("h", 1, 15), 16, 10)
                           .cast("long")).alias("x"),
                 F.count("*").alias("n")).collect()[0])


def test_export_three_readers_exact(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dst = str(tmp_path / "docs")
    man = export_parquet(df.repartition(3), dst,
                         dictionary={"lang", "source"},
                         page_rows=20, row_group_rows=40)
    rows = [r for r in man.collect() if r.file]
    assert len(rows) == 3
    assert sum(r.rows for r in rows) == df.count()
    back = spark.read.parquet(dst)
    assert tuple(_fingerprint(back)) == tuple(_fingerprint(df))
    # pyarrow: stats + page index present on every file
    for f in glob.glob(os.path.join(dst, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        c0 = md.row_group(0).column(0)
        assert c0.statistics is not None and c0.statistics.has_min_max
        assert c0.has_column_index
    # duckdb
    n, s = duckdb.sql(
        f"SELECT count(*), sum(doc_id) FROM "
        f"read_parquet('{dst}/*.parquet')").fetchall()[0]
    exp = df.agg(F.count("*"), F.sum("doc_id")).collect()[0]
    assert (n, s) == tuple(exp)


def test_export_list_columns(spark, tmp_path):
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id",
                  F.split("text", " ").alias("toks"),
                  F.expr("CASE WHEN doc_id % 7 = 0 THEN NULL "
                         "ELSE sequence(1, 1 + CAST(doc_id % 4 AS INT)) "
                         "END").alias("seq")))
    dst = str(tmp_path / "lists")
    export_parquet(df.repartition(2), dst, compression="snappy").collect()
    back = spark.read.parquet(dst)
    a = (df.select("doc_id", F.concat_ws(" ", "toks").alias("t"),
                   F.coalesce(F.expr("aggregate(seq, 0L, (a, x) -> a + x)"),
                              F.lit(-1)).alias("s")))
    b = (back.select("doc_id", F.concat_ws(" ", "toks").alias("t"),
                     F.coalesce(F.expr("aggregate(seq, 0L, (a, x) -> a + x)"),
                                F.lit(-1)).alias("s")))
    assert tuple(_fingerprint(a)) == tuple(_fingerprint(b))


def test_export_rejects_unsupported_types(spark, tmp_path):
    # nested-inside-nested stays out of scope: map values that are
    # arrays can't flow through the one-level Dremel writer
    df = spark.range(3).select(
        F.col("id"),
        F.create_map(F.lit("k"), F.array(F.col("id"))).alias("m"))
    with pytest.raises(ValueError, match="unsupported column types"):
        export_parquet(df, str(tmp_path / "bad"))


def test_export_nulls_and_empty_partition(spark, tmp_path):
    df = (spark.range(100)
          .select(F.when(F.col("id") % 5 == 0, None)
                  .otherwise(F.col("id")).alias("v"),
                  F.when(F.col("id") % 3 == 0, None)
                  .otherwise(F.concat(F.lit("s"), F.col("id")))
                  .alias("s")))
    dst = str(tmp_path / "nulls")
    # more partitions than rows in some -> empty-partition path
    export_parquet(df.repartition(8), dst, page_rows=10).collect()
    back = spark.read.parquet(dst)
    assert tuple(_fingerprint(back)) == tuple(_fingerprint(df))


def test_scan_parquet_roundtrip_projection_prune(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from cpp_parquet_spark.export import scan_parquet
    dst = str(tmp_path / "scan")
    export_parquet(df.repartitionByRange(4, "doc_id"), dst,
                   dictionary={"lang"}, page_rows=10,
                   row_group_rows=20).collect()
    back = scan_parquet(spark, dst)
    assert tuple(_fingerprint(back.select(*df.columns))) == \
        tuple(_fingerprint(df))
    # projection decodes only the requested chunks
    proj = scan_parquet(spark, dst, columns=["doc_id", "lang"])
    assert sorted(proj.columns) == ["doc_id", "lang"]
    assert proj.count() == df.count()
    # metadata-only file pruning: range-partitioned files have disjoint
    # doc_id windows, so a narrow range must drop files
    pruned = scan_parquet(spark, dst, range_prune=("doc_id", 5, 15))
    assert pruned.rdd.getNumPartitions() < 4
    got = pruned.filter("doc_id between 5 and 15") \
        .agg(F.sum("doc_id"), F.count("*")).collect()[0]
    exp = df.filter("doc_id between 5 and 15") \
        .agg(F.sum("doc_id"), F.count("*")).collect()[0]
    assert tuple(got) == tuple(exp)


def test_scan_parquet_list_column(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", F.split("text", " ").alias("toks")))
    dst = str(tmp_path / "scanlist")
    export_parquet(df.repartition(2), dst).collect()
    back = scan_parquet(spark, dst)
    a = df.select("doc_id", F.concat_ws(" ", "toks").alias("t"))
    b = back.select("doc_id", F.concat_ws(" ", "toks").alias("t"))
    assert tuple(_fingerprint(b)) == tuple(_fingerprint(a))


def test_scan_parquet_all_files_pruned_is_empty(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = spark.range(100).select(F.col("id").alias("v"))
    dst = str(tmp_path / "allpruned")
    export_parquet(df.repartition(2), dst).collect()
    out = scan_parquet(spark, dst, range_prune=("v", 10**9, 2 * 10**9))
    assert out.count() == 0
    assert out.columns == ["v"]


def test_scan_parquet_row_group_granular_pruning(spark, tmp_path):
    # one file, many row groups sorted on v: a narrow range must decode
    # only the matching ROW GROUPS, not the whole file
    from cpp_parquet_spark.export import scan_parquet, _rg_stats
    import glob
    df = (spark.range(10000).select(F.col("id").alias("v"))
          .coalesce(1).sortWithinPartitions("v"))
    dst = str(tmp_path / "rgprune")
    export_parquet(df, dst, row_group_rows=1000, page_rows=250).collect()
    f = glob.glob(dst + "/*.parquet")[0]
    assert len(_rg_stats(f)) == 10
    out = scan_parquet(spark, dst, range_prune=("v", 2500, 3500))
    n_all = out.count()
    # rgs 2-3 only: 2000 rows survive the rg prune
    assert n_all == 2000
    got = out.filter("v between 2500 and 3500").agg(
        F.count("*"), F.sum("v")).collect()[0]
    exp = df.filter("v between 2500 and 3500").agg(
        F.count("*"), F.sum("v")).collect()[0]
    assert tuple(got) == tuple(exp)


def test_scan_parquet_apply_range_in_worker(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = (spark.range(10000).select(F.col("id").alias("v"),
                                    F.concat(F.lit("s"), F.col("id"))
                                    .alias("s"))
          .coalesce(1).sortWithinPartitions("v"))
    dst = str(tmp_path / "applyrange")
    export_parquet(df, dst, row_group_rows=1000).collect()
    out = scan_parquet(spark, dst, range_prune=("v", 2500, 3500),
                       apply_range=True)
    # the exact predicate applied in-worker: every surviving row matches
    assert out.count() == 1001
    got = out.agg(F.sum("v"), F.count("*")).collect()[0]
    exp = df.filter("v between 2500 and 3500") \
        .agg(F.sum("v"), F.count("*")).collect()[0]
    assert tuple(got) == tuple(exp)
    with pytest.raises(ValueError, match="apply_range"):
        scan_parquet(spark, dst, columns=["s"],
                     range_prune=("v", 1, 2), apply_range=True)


def test_spark_pushes_filters_into_our_files(spark, tmp_path):
    # parquet-mr consumes OUR row-group Statistics: the physical plan
    # shows PushedFilters against the exported files and the filtered
    # result is exact
    df = (spark.range(50000).select(F.col("id").alias("v"))
          .coalesce(1).sortWithinPartitions("v"))
    dst = str(tmp_path / "push")
    export_parquet(df, dst, row_group_rows=5000).collect()
    back = spark.read.parquet(dst).filter("v between 5000 and 6000")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(v), GreaterThanOrEqual(v,5000)" \
        in plan
    assert back.count() == 1001


def test_export_scan_struct_column(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = (spark.range(500).select(
        F.col("id").alias("v"),
        F.when(F.col("id") % 7 == 0, None).otherwise(
            F.struct(F.col("id").alias("u"),
                     F.when(F.col("id") % 3 == 0, None)
                     .otherwise(F.concat(F.lit("s"), F.col("id")))
                     .alias("w"))).alias("st")))
    dst = str(tmp_path / "structs")
    export_parquet(df.repartition(3), dst).collect()
    proj = ["v", F.col("st.u"), F.col("st.w"),
            F.col("st").isNull().alias("n")]
    a = df.select(*proj)
    for back in (spark.read.parquet(dst), scan_parquet(spark, dst)):
        b = back.select("v", F.col("st.u"), F.col("st.w"),
                        F.col("st").isNull().alias("n"))
        assert tuple(_fingerprint(b)) == tuple(_fingerprint(a))


def test_export_scan_map_column(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = (spark.range(200).select(
        F.col("id").alias("v"),
        F.when(F.col("id") % 7 == 0, None).otherwise(
            F.create_map(F.lit("k"), F.col("id").cast("string"),
                         F.concat(F.lit("x"), F.col("id")), F.lit("y")))
        .alias("m")))
    dst = str(tmp_path / "maps")
    export_parquet(df.repartition(2), dst).collect()
    a = df.select("v", F.map_keys("m").alias("k"),
                  F.map_values("m").alias("w"))
    for back in (spark.read.parquet(dst), scan_parquet(spark, dst)):
        b = back.select("v", F.map_keys("m").alias("k"),
                        F.map_values("m").alias("w"))
        assert tuple(_fingerprint(b)) == tuple(_fingerprint(a))


def test_footer_schema_matches_decoded_types(spark, tmp_path):
    # schema discovery must come from the footer SchemaElements alone
    # and agree exactly with what a full decode materializes
    from cpp_parquet_spark import interop
    df = spark.range(50).select(
        F.col("id").alias("i64"),
        F.col("id").cast("int").alias("i32"),
        F.col("id").cast("tinyint").alias("i8"),
        F.col("id").cast("smallint").alias("i16"),
        (F.col("id") * 1.5).cast("double").alias("f64"),
        F.col("id").cast("float").alias("f32"),
        F.col("id").cast("decimal(12,2)").alias("dec"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.col("id").cast("int")).alias("d"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        F.struct(F.col("id").alias("u"),
                 (F.col("id") * 2.0).alias("v")).alias("st"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"))
    dst = str(tmp_path / "ftypes")
    export_parquet(df.coalesce(1), dst).collect()
    f = glob.glob(dst + "/*.parquet")[0]
    ft = interop.footer_schema(f)
    decoded = interop.read_parquet_with_our_codecs(f)
    assert list(ft) == list(decoded)
    for name, arr in decoded.items():
        want = ft[name]
        got = arr.type
        # reader may materialize large_* offsets; compare the
        # normalized (small-offset) form the scan declares
        from cpp_parquet_spark.export import _norm_type
        assert _norm_type(got) == want, (name, got, want)


def test_scan_pruning_decisions_match_driver_recompute(spark, tmp_path,
                                                       monkeypatch):
    # the DISTRIBUTED footer pass (forced via threshold=0) must reach
    # the IDENTICAL surviving (file, row group) set a driver-side loop
    # over _rg_stats computes — and the driver-side small-directory
    # path must agree with both
    from cpp_parquet_spark import export as export_mod
    from cpp_parquet_spark.export import scan_parquet, _rg_stats
    df = (spark.range(8000).select(F.col("id").alias("v"),
                                   (F.col("id") % 7).alias("w"))
          .repartitionByRange(4, "v").sortWithinPartitions("v"))
    dst = str(tmp_path / "planparity")
    export_parquet(df, dst, row_group_rows=500, page_rows=100).collect()
    lo, hi = 3000, 4200
    expected = []
    for f in sorted(glob.glob(dst + "/*.parquet")):
        for rgi, ent in enumerate(_rg_stats(f)):
            st = ent.get("v")
            if st is None or (st[1] >= lo and st[0] <= hi):
                expected.append((f, rgi))
    assert 0 < len(expected) < 16          # pruning actually happened
    exp = df.filter(f"v between {lo} and {hi}") \
        .agg(F.count("*"), F.sum("v")).collect()[0]
    orig_threshold = export_mod.PARALLEL_PLAN_THRESHOLD
    for threshold in (0, orig_threshold):
        monkeypatch.setattr(export_mod, "PARALLEL_PLAN_THRESHOLD",
                            threshold)
        out = scan_parquet(spark, dst, range_prune=("v", lo, hi))
        assert out.rdd.getNumPartitions() == len(expected), threshold
        got = out.filter(f"v between {lo} and {hi}") \
            .agg(F.count("*"), F.sum("v")).collect()[0]
        assert tuple(got) == tuple(exp), threshold


def test_check_schema_rejects_nested_unsupported_leaf(spark, tmp_path):
    # struct<iv:interval> must fail on the DRIVER pre-check, not
    # inside an executor mid-job (timestamps became supported in r5,
    # so the probe type is a day-time interval)
    df = spark.range(3).select(
        F.col("id"),
        F.struct(F.expr("INTERVAL '1' DAY").alias("iv")).alias("st"))
    with pytest.raises(ValueError, match="unsupported column types"):
        export_parquet(df, str(tmp_path / "badnest"))
    dfm = spark.range(3).select(
        F.col("id"),
        F.create_map(F.lit("k"), F.expr("INTERVAL '2' HOUR")).alias("m"))
    with pytest.raises(ValueError, match="unsupported column types"):
        export_parquet(dfm, str(tmp_path / "badmap"))


def test_export_scan_timestamps(spark, tmp_path):
    # TIMESTAMP (UTC-adjusted) and TIMESTAMP_NTZ columns through the
    # sink and back: Spark's JVM reader must see the exact logical
    # types (tz-aware vs ntz comes from the LogicalType struct), and
    # our scan + DuckDB must agree on the values
    df = spark.range(300).select(
        F.col("id"),
        F.expr("CASE WHEN id % 9 = 0 THEN NULL ELSE "
               "timestamp_micros(CAST(id * 1000003 AS BIGINT)) END")
        .alias("ts"),
        F.expr("CASE WHEN id % 5 = 0 THEN NULL ELSE "
               "CAST(timestamp_micros(CAST(id * 7 AS BIGINT)) "
               "AS TIMESTAMP_NTZ) END").alias("tsn"))
    dst = str(tmp_path / "ts")
    export_parquet(df.repartition(2), dst).collect()
    back = spark.read.parquet(dst)
    assert back.schema.simpleString() == \
        "struct<id:bigint,ts:timestamp,tsn:timestamp_ntz>"

    def canon(frame):
        return frame.selectExpr("id", "CAST(ts AS STRING) s",
                                "CAST(tsn AS STRING) sn") \
            .orderBy("id").collect()

    assert canon(back) == canon(df)
    from cpp_parquet_spark.export import scan_parquet
    assert canon(scan_parquet(spark, dst)) == canon(df)
    n_ts, n_tsn = duckdb.sql(
        f"SELECT count(ts), count(tsn) "
        f"FROM read_parquet('{dst}/*.parquet')").fetchone()
    assert (n_ts, n_tsn) == (df.filter("ts IS NOT NULL").count(),
                             df.filter("tsn IS NOT NULL").count())


def test_export_scan_list_of_struct(spark, tmp_path):
    # array<struct<scalars>> through the distributed sink and back via
    # three readers: Spark's JVM parquet reader, DuckDB, and our own
    # scan_parquet — all five null shapes
    from cpp_parquet_spark.export import scan_parquet
    df = spark.range(200).select(
        F.col("id"),
        F.expr("""CASE WHEN id % 11 = 0 THEN NULL
                  WHEN id % 9 = 0 THEN array()
                  ELSE transform(sequence(0, CAST(id % 3 AS INT)),
                       i -> CASE WHEN (id + i) % 6 = 0 THEN NULL
                            ELSE named_struct('u', id * 10 + i,
                                 'v', CASE WHEN (id + i) % 5 = 0
                                      THEN NULL
                                      ELSE concat('s', id, '_', i) END)
                            END)
                  END""").alias("evs"))
    dst = str(tmp_path / "ls")
    export_parquet(df.repartition(3), dst).collect()

    def canon(frame):
        return frame.selectExpr(
            "id", "to_json(struct(evs)) AS js").orderBy("id").collect()

    assert canon(spark.read.parquet(dst)) == canon(df)
    back = scan_parquet(spark, dst)
    assert canon(back) == canon(df)
    n_el = duckdb.sql(
        f"SELECT count(*) FROM (SELECT unnest(evs) FROM "
        f"read_parquet('{dst}/*.parquet'))").fetchone()[0]
    exp = df.select(F.explode("evs")).count()
    assert n_el == exp


def test_plan_row_groups_property_vs_bruteforce(spark, tmp_path):
    # the shared metadata planner's survivors must equal a brute-force
    # per-row-group recompute for random predicate mixes (ranges, eqs,
    # IN-lists) over a multi-file multi-row-group layout with blooms
    import random

    from cpp_parquet_spark.export import plan_row_groups, _rg_stats
    from cpp_parquet_spark import interop
    rng = random.Random(17)
    df = spark.range(12000).select(
        F.col("id").alias("v"),
        ((F.col("id") * 104729) % 9973).alias("k"))
    dst = str(tmp_path / "prop")
    export_parquet(df.repartitionByRange(3, "v")
                   .sortWithinPartitions("v"),
                   dst, row_group_rows=700, bloom={"k"}).collect()
    files = sorted(glob.glob(dst + "/*.parquet"))
    per_rg = {f: _rg_stats(f) for f in files}

    def brute(ranges, eqs, ins):
        out = []
        for f in files:
            blooms = {col: interop.bloom_rg_survivors(f, col, v)
                      for col, v in eqs}
            in_bl = {col: [interop.bloom_rg_survivors(f, col, v)
                           for v in vals] for col, vals in ins}
            for rgi, ent in enumerate(per_rg[f]):
                ok = True
                for col, lo, hi in ranges:
                    st_ = ent.get(col)
                    if st_ and ((lo is not None and st_[1] < lo)
                                or (hi is not None and st_[0] > hi)):
                        ok = False
                for col, v in eqs:
                    st_ = ent.get(col)
                    if st_ and not (st_[0] <= v <= st_[1]):
                        ok = False
                    bl = blooms[col]
                    if bl is not None and not bl.get(rgi, True):
                        ok = False
                for col, vals in ins:
                    alive = False
                    for i, v in enumerate(vals):
                        st_ = ent.get(col)
                        good = not (st_ and not (st_[0] <= v <= st_[1]))
                        bl = in_bl[col][i]
                        if good and bl is not None \
                                and not bl.get(rgi, True):
                            good = False
                        alive = alive or good
                    ok = ok and alive
                if ok:
                    out.append((f, rgi))
        return sorted(out)

    for _ in range(12):
        ranges, eqs, ins = [], [], []
        if rng.random() < 0.7:
            lo = rng.randrange(0, 12000)
            ranges.append(("v", lo, lo + rng.randrange(1, 4000)))
        if rng.random() < 0.7:
            eqs.append(("k", rng.randrange(0, 9973)))
        if rng.random() < 0.5:
            ins.append(("k", tuple(rng.randrange(0, 9973)
                                   for _ in range(3))))
        got = plan_row_groups(files, ranges, eqs, ins=ins)
        assert got == brute(ranges, eqs, ins), (ranges, eqs, ins)


def test_scan_parquet_struct_column_not_last(spark, tmp_path):
    # regression (round-5 review): the reader's output dict appends
    # struct/map reassemblies AFTER flat columns, but the declared scan
    # schema is in FOOTER order — a struct column in the middle must
    # still bind to the right slot
    from cpp_parquet_spark.export import scan_parquet
    df = spark.range(200).select(
        F.col("id").alias("a"),
        F.struct(F.col("id").alias("u"),
                 (F.col("id") * 2.0).alias("v")).alias("s"),
        (F.col("id") + 7).alias("b"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        F.concat(F.lit("x"), F.col("id")).alias("t"))
    dst = str(tmp_path / "structmid")
    export_parquet(df.repartition(2), dst).collect()
    back = scan_parquet(spark, dst)
    assert back.columns == ["a", "s", "b", "m", "t"]
    got = back.selectExpr("a", "s.u", "s.v", "b",
                          "m['k'] AS mk", "t").orderBy("a").collect()
    exp = df.selectExpr("a", "s.u", "s.v", "b",
                        "m['k'] AS mk", "t").orderBy("a").collect()
    assert got == exp


def test_export_scan_list_bool(spark, tmp_path):
    from cpp_parquet_spark.export import scan_parquet
    df = spark.range(150).select(
        F.col("id"),
        F.expr("CASE WHEN id % 7 = 0 THEN NULL ELSE "
               "transform(sequence(0, CAST(id % 4 AS INT)), "
               "i -> (id + i) % 3 = 0) END").alias("flags"))
    dst = str(tmp_path / "lb")
    export_parquet(df.repartition(2), dst).collect()

    def canon(fr):
        return fr.selectExpr("id", "to_json(struct(flags)) j") \
            .orderBy("id").collect()

    assert canon(spark.read.parquet(dst)) == canon(df)
    assert canon(scan_parquet(spark, dst)) == canon(df)
