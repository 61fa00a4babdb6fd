"""End-to-end engine tests: encode -> pages -> decode -> sha256-bit-identical
(BASELINE.json:15 per-row invariant), on driver fixtures and the synthetic
north-rule table; plus codec-selection sanity and size bounds vs the
stand-in reference writer (pyarrow, BASELINE.md rows 3-5)."""

import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from cpp_parquet_spark import synth
from cpp_parquet_spark.engine import (decode_table, encode_table,
                                      verify_roundtrip)
from cpp_parquet_spark.partitioning import EncodeConfig


def roundtrip_all_columns(spark, df, cfg):
    pages = encode_table(df, cfg).cache()
    try:
        dec = decode_table(pages).cache()
        assert dec.count() == df.count()
        for c in dec.columns:
            r = verify_roundtrip(df, dec, c)
            assert r["mismatched_hashes"] == 0, f"column {c}: {r}"
        return pages
    finally:
        pages.unpersist()


TABLES = {
    "documents": EncodeConfig(keys=("source",), salt_from=("doc_id",),
                              num_parts=4, order_keys=("doc_id",),
                              table_name="documents"),
    "events": EncodeConfig(keys=("event_type",), salt_from=("event_id",),
                           num_parts=4, order_keys=("event_id",),
                           table_name="events"),
    "lineitem": EncodeConfig(keys=("l_returnflag",), salt_from=("l_orderkey",),
                             num_parts=6, order_keys=("l_orderkey", "l_linenumber"),
                             table_name="lineitem"),
    "orders": EncodeConfig(keys=("o_orderstatus",), salt_from=("o_orderkey",),
                           num_parts=4, order_keys=("o_orderkey",),
                           table_name="orders"),
    "supplier": EncodeConfig(keys=("s_nationkey",), salt_from=("s_suppkey",),
                             num_parts=2, order_keys=("s_suppkey",),
                             table_name="supplier"),
    "region": EncodeConfig(keys=("r_regionkey",), salt_from=(),
                           num_parts=2, order_keys=("r_regionkey",),
                           table_name="region"),
}


@pytest.mark.parametrize("table", list(TABLES))
def test_fixture_roundtrip(spark, sf_dir, table):
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    roundtrip_all_columns(spark, df, TABLES[table])


def test_repofiles_roundtrip(spark):
    path = synth.fixture_path("sf0.001")
    df = spark.read.parquet(path)
    cfg = EncodeConfig(keys=("repo",), salt_from=("path",), num_parts=8,
                       order_keys=("repo", "path"), table_name="repofiles")
    pages = encode_table(df, cfg).cache()
    try:
        dec = decode_table(pages)
        for c in ["repo", "path", "commit", "lang", "content"]:
            r = verify_roundtrip(df, dec, c)
            assert r["mismatched_hashes"] == 0, f"column {c}: {r}"
    finally:
        pages.unpersist()


def test_size_beats_standin_reference(spark):
    """Encoded size must be <= the stand-in reference writer's
    (pyarrow UNCOMPRESSED, dict enabled — BASELINE.md rows 3-5, 8)."""
    path = synth.fixture_path("sf0.001")
    df = spark.read.parquet(path)
    cfg = EncodeConfig(keys=("repo",), salt_from=("path",), num_parts=4,
                       table_name="repofiles")
    pages = encode_table(df, cfg)
    ours = (pages.filter(F.col("col_idx") >= 0)
            .groupBy("column").agg(F.sum("enc_bytes").alias("b"))
            .collect())
    ours = {r["column"]: r["b"] for r in ours}

    # stand-in reference: pyarrow parquet, UNCOMPRESSED, dictionary on
    import tempfile
    tbl = pq.read_table(path)
    ref_sizes = {}
    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        pq.write_table(tbl, f.name, compression="NONE", use_dictionary=True)
        meta = pq.ParquetFile(f.name).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                name = col.path_in_schema
                ref_sizes[name] = ref_sizes.get(name, 0) + col.total_compressed_size
    total_ours = sum(ours.values())
    total_ref = sum(ref_sizes.values())
    assert total_ours <= total_ref, f"ours {ours} vs reference {ref_sizes}"
    # content (the FSST target) must individually beat the reference
    assert ours["content"] < ref_sizes["content"]


def test_codec_selection_signals(spark, sf_dir):
    """E8 expectations from FIXTURES.md A: lang/source -> dict,
    n_chars -> int codec (for/rle/dict/bitpack), text -> fsst."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = encode_table(df, TABLES["documents"])
    rows = (pages.filter(F.col("col_idx") >= 0)
            .select("column", "codec").distinct().collect())
    chosen = {}
    for r in rows:
        chosen.setdefault(r["column"], set()).add(r["codec"])
    assert chosen["lang"] == {"dict"}
    # dict on every sizeable chunk; a ~100-value chunk can legitimately
    # measure front coding a few bytes smaller ("src1*" values share
    # 4-byte prefixes), so prefix is admitted, never required
    assert {"dict"} <= chosen["source"] <= {"dict", "prefix"}
    assert chosen["text"] == {"fsst"}
    assert chosen["n_chars"] <= {"for", "rle", "dict", "bitpack"}


def test_embeddings_roundtrip(spark, sf_dir):
    """array<float> columns encode via the listf composite codec (list
    lengths through FOR-framed RLE, child floats PLAIN) and must decode
    bit-identically."""
    import math
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cfg = EncodeConfig(keys=("label",), salt_from=("vec_id",), num_parts=2,
                       order_keys=("vec_id",), table_name="embeddings")
    pages = encode_table(df, cfg)
    cols = {r["column"] for r in pages.select("column").distinct().collect()}
    assert "embedding" in cols
    decoded = decode_table(pages, columns=[("vec_id", "i64"),
                                           ("embedding", "arrf32"),
                                           ("label", "i32")])
    src = {r["vec_id"]: r["embedding"] for r in df.collect()}
    got = {r["vec_id"]: r["embedding"] for r in decoded.collect()}
    assert set(src) == set(got)
    for k in src:
        assert len(src[k]) == len(got[k])
        for a, b in zip(src[k], got[k]):
            assert math.isclose(a, b, rel_tol=0.0, abs_tol=0.0) or a == b


@pytest.mark.parametrize("blk", ["zlib", "zstd"])
def test_block_codec_end_to_end(spark, sf_dir, blk):
    """E9 through the full pipeline: block-compressed pages decode to
    sha256-identical values and shrink compressible text columns."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_cfg = TABLES["documents"]
    from dataclasses import replace
    cfg = replace(base_cfg, block_codec=blk,
                  codec_overrides={"text": "plain"})
    pages = encode_table(df, cfg).cache()
    try:
        dec = decode_table(pages)
        r = verify_roundtrip(df, dec, "text")
        assert r["mismatched_hashes"] == 0
        plain_cfg = replace(base_cfg, codec_overrides={"text": "plain"})
        sz = lambda p: (p.filter(F.col("column") == "text")
                        .agg(F.sum("enc_bytes")).collect()[0][0])
        assert sz(pages) < sz(encode_table(df, plain_cfg))
    finally:
        pages.unpersist()


def test_suggest_block_codec(spark, sf_dir):
    from cpp_parquet_spark.stats import column_stats, suggest_block_codec
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st = column_stats(df, TABLES["documents"], fraction=1.0).cache()
    try:
        # natural-language text sits well under 6.5 bits/byte
        assert suggest_block_codec(st) == "zstd"
        assert suggest_block_codec(st, prefer="zlib") == "zlib"
        assert suggest_block_codec(st, entropy_max=0.5) is None
    finally:
        st.unpersist()
    # float-dominated table (embeddings): no str bytes to measure, but
    # the float fraction unlocks the byte-stream-split + block pairing
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from cpp_parquet_spark.partitioning import EncodeConfig
    ecfg = EncodeConfig(keys=("label",), salt_from=("vec_id",), num_parts=2,
                        order_keys=("vec_id",), table_name="embeddings")
    est = column_stats(emb, ecfg, fraction=1.0).cache()
    try:
        assert suggest_block_codec(est) == "zstd"
        assert suggest_block_codec(est, float_frac_min=1.1) is None
    finally:
        est.unpersist()


def test_no_shuffle_roundtrip_bit_identical(spark, sf_dir):
    """Shuffle-free ingest mode: part_id = scan split; encode -> decode
    must still reproduce every value sha256-identical."""
    from cpp_parquet_spark.engine import decode_table, encode_table, verify_roundtrip
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = EncodeConfig(no_shuffle=True, table_name="documents")
    pages = encode_table(df, cfg).cache()
    try:
        decoded = decode_table(pages, columns=pages._cps_columns)
        res = verify_roundtrip(df, decoded, "text")
        assert res["sha256_match_rate"] == 1.0, res
        # every scan split became a part
        nparts = pages.select("part_id").distinct().count()
        assert nparts == df.rdd.getNumPartitions()
    finally:
        pages.unpersist()


def test_page_crc_end_to_end(spark, sf_dir):
    """cfg.page_crc through the full pipeline: every page carries a crc,
    clean decode round-trips, and a corrupted blob fails loudly instead
    of returning silently wrong rows."""
    import json
    from dataclasses import replace
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = replace(TABLES["documents"], page_crc=True)
    pages = encode_table(df, cfg).cache()
    try:
        params = [r["params"] for r in
                  pages.filter(F.col("col_idx") >= 0)
                       .select("params").collect()]
        assert params and all("crc" in json.loads(p) for p in params)
        dec = decode_table(pages)
        assert verify_roundtrip(df, dec, "text")["mismatched_hashes"] == 0
        # flip one byte inside every text page blob -> decode must raise
        import pyarrow as pa
        from cpp_parquet_spark.engine import PAGES_SCHEMA

        def corrupt(batches):
            for b in batches:
                d = b.to_pydict()
                d["data"] = [
                    (bytes(x[:7]) + bytes([x[7] ^ 0x5A]) + bytes(x[8:]))
                    if c == "text" and x and len(x) > 8 else x
                    for c, x in zip(d["column"], d["data"])]
                yield pa.RecordBatch.from_pydict(d, schema=b.schema)

        bad = pages.mapInArrow(corrupt, PAGES_SCHEMA)
        import pytest as _pt
        with _pt.raises(Exception) as ei:
            decode_table(bad, columns=pages._cps_columns).count()
        assert "PageCorruptError" in str(ei.value) \
            or "crc mismatch" in str(ei.value)
    finally:
        pages.unpersist()


def test_corruption_never_silent_without_crc(spark, sf_dir):
    """Without page_crc, a flipped blob byte must surface as EITHER a
    decode error or mismatched verify hashes — never a silent clean
    roundtrip (the skill-book corruption probe, pinned)."""
    import pyarrow as pa
    from cpp_parquet_spark.engine import PAGES_SCHEMA
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = encode_table(df, TABLES["documents"])

    def corrupt(batches):
        for b in batches:
            d = b.to_pydict()
            d["data"] = [
                (bytes(x[:-2]) + bytes([x[-2] ^ 0x41]) + bytes(x[-1:]))
                if c == "text" and x and len(x) > 8 else x
                for c, x in zip(d["column"], d["data"])]
            yield pa.RecordBatch.from_pydict(d, schema=b.schema)

    bad = pages.mapInArrow(corrupt, PAGES_SCHEMA)
    try:
        res = verify_roundtrip(
            df, decode_table(bad, columns=pages._cps_columns), "text")
        assert res["mismatched_hashes"] > 0, \
            "corrupted pages decoded to a clean roundtrip"
    except AssertionError:
        raise
    except Exception:
        pass      # a loud decode failure is an acceptable detection too


def test_decode_dataset_column_subset(spark, sf_dir, tmp_path):
    """Projection pushdown on the durable read path: only the named
    columns' blobs are scanned/decoded; where-column residual still
    works when it isn't projected."""
    from pyspark.sql import functions as F
    from cpp_parquet_spark.engine import decode_dataset, run_encode
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dst = str(tmp_path / "ds_subset")
    cfg = EncodeConfig(keys=("source",), salt_from=(), num_parts=4,
                       order_keys=("doc_id",), table_name="documents")
    run_encode(spark, df, dst, cfg, resume=False)
    out = decode_dataset(spark, dst, columns=["doc_id", "lang"])
    assert out.columns == ["doc_id", "lang"]
    want = df.select("doc_id", "lang")
    assert out.exceptAll(want).count() == 0
    assert want.exceptAll(out).count() == 0
    # where-column (n_chars) not projected: residual filter still applies
    sel = decode_dataset(spark, dst, where=("n_chars", 100, 2000),
                         columns=["doc_id"])
    assert sel.columns == ["doc_id"]
    want2 = df.filter((F.col("n_chars") >= 100)
                      & (F.col("n_chars") <= 2000)).select("doc_id")
    assert sel.exceptAll(want2).count() == 0
    assert want2.exceptAll(sel).count() == 0
    import pytest
    with pytest.raises(ValueError, match="unknown columns"):
        decode_dataset(spark, dst, columns=["nope"])


def test_quantized_array_int_roundtrip(spark, sf_dir):
    """array<int> (ARRI tags, listi composite): a quantized-embeddings
    table encodes/decodes bit-identically, including null and empty
    vectors; the stats plan routes arri columns to listi."""
    from cpp_parquet_spark import quantize
    from cpp_parquet_spark.stats import column_stats, decide_codecs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = quantize.quantize(emb)
    # inject edge rows: a null qvec and an empty qvec
    import pyspark.sql.functions as SF
    q = q.withColumn(
        "qvec",
        SF.when(SF.col("id") == 0, SF.lit(None).cast("array<int>"))
          .when(SF.col("id") == 1, SF.array().cast("array<int>"))
          .otherwise(SF.col("qvec")))
    cfg = EncodeConfig(keys=("id",), salt_from=(), num_parts=4,
                       order_keys=("id",), table_name="quantized")
    pages = encode_table(q, cfg).cache()
    try:
        codecs = {r["codec"] for r in
                  pages.filter(SF.col("column") == "qvec")
                       .select("codec").distinct().collect()}
        assert codecs == {"listi"}
        got = {r["id"]: r["qvec"] for r in decode_table(pages).collect()}
        want = {r["id"]: r["qvec"] for r in q.collect()}
        assert got == want
    finally:
        pages.unpersist()
    st = column_stats(q, cfg, fraction=1.0).cache()
    try:
        dec = {r["column"]: r["codec"] for r in decide_codecs(st).collect()
               if r["column"] == "qvec"}
        assert dec["qvec"] == "listi"
    finally:
        st.unpersist()


def test_decode_table_colocated_matches_grouped(spark):
    # the shuffle-free decode path must be bit-identical to the grouped
    # path over encode_table output (whole parts per partition), and
    # must REFUSE a repartitioned frame (parts split across partitions)
    import pyspark.sql.functions as F
    import pytest as _pytest

    from cpp_parquet_spark.engine import decode_table, encode_table
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "lang", "text"))
    cfg = EncodeConfig(keys=("doc_id",), salt_from=(), num_parts=6,
                       order_keys=("doc_id",), table_name="docs_colo",
                       page_bytes=2048, page_rows_max=64)
    pages = encode_table(df, cfg).cache()
    try:
        cols = pages._cps_columns
        fp = lambda d: tuple(d.agg(
            F.count("*"), F.sum("doc_id"),
            F.bit_xor(F.xxhash64("text"))).collect()[0])
        a = fp(decode_table(pages, columns=cols))
        b = fp(decode_table(pages, columns=cols, colocated=True))
        assert a == b
        with _pytest.raises(Exception, match="split across partitions"):
            decode_table(pages.repartition(16), columns=cols,
                         colocated=True).count()
    finally:
        pages.unpersist()


def test_decode_table_colocated_rejects_column_split(spark):
    # review finding: a repartition("column") keeps every page run
    # starting at 0 but separates a part's COLUMNS — the colocated path
    # must refuse instead of emitting duplicated rows with
    # complementary NULL columns
    import pyspark.sql.functions as F
    import pytest as _pytest

    from cpp_parquet_spark.engine import decode_table, encode_table
    from cpp_parquet_spark.partitioning import EncodeConfig
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "lang"))
    cfg = EncodeConfig(keys=("doc_id",), salt_from=(), num_parts=4,
                       order_keys=("doc_id",), table_name="docs_colsplit")
    pages = encode_table(df, cfg)
    split = pages.repartition(8, "column")
    with _pytest.raises(Exception, match="columns split|split across"):
        decode_table(split, columns=pages._cps_columns,
                     colocated=True).count()
