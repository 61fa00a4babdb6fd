#!/usr/bin/env python
"""Bench harness (SURVEY.md §7 M7; driver contract).

Runs the engine's headline pipelines on ``local[$SPARK_GRAFT_CPUS]``
(default 32). Two artifacts (VERDICT r3 item 3 — the r3 single-line
record outgrew the driver's capture window and parsed as null):

- stdout LAST line: a COMPACT headline JSON —

    {"metric": "bench_total_wall", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "encode_gbps": <content GB/s of the north-rule encode>,
     "decode_gbps": <content GB/s of decode alone, cached pages>,
     "content_bytes": ..., "size": {...ratios only...},
     "scaling": {...efficiencies only...}, "receipts": <path>}

- ``$BENCH_RECEIPTS`` (default ``BENCH_local_last.json`` next to this
  file): the FULL record — per-rep walls, membw receipts per wall, busy
  maps, flare reruns, host bandwidth curves.

Inputs:
- the north-rule table ``(repo, path, commit, lang, content)`` synthesized
  deterministically (seed 42) by ``cpp_parquet_spark.synth`` — no external
  data (BASELINE.json:14);
- the driver fixtures at ``$SPARK_GRAFT_SF_DIR`` (default
  ``/root/testdata/sf0.1``).

Scaling evidence (two-cluster-size rule): after the query sweep the
harness measures two N-vs-4N pairs on a fixed 2 GB input — primary
local[2]/local[8] (inside the host's memory-bandwidth scaling envelope),
secondary local[8]/local[32] (whole box; hostage to co-tenant bandwidth
pressure, see the membw samples) — encode only, min-of-reps per level,
all levels in THIS process's JIT-warm JVM via context stop/recreate;
both pairs + efficiency land in the JSON as ``"scaling"``;
``encode_gbps`` / ``encode_plain_gbps`` are taken from the local[32] legs
so they measure kernel throughput at 2 GB, not the 5 s job-setup floor
that dominates the 248 MB sweep. ``tools/scaling.py`` remains the
long-form multi-pair tool.

Env knobs:
  SPARK_GRAFT_SF_DIR   driver fixture dir          (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism         (default 32)
  BENCH_REPOFILES_ROWS north-rule table row count  (default 100000)
  BENCH_ONLY           comma-separated query subset (also disables probe)
  BENCH_SCALING        0 disables the scaling probe (default 1)
  BENCH_SCALING_ROWS   probe input rows            (default 800000)
  BENCH_SCALING_REPS   probe reps per level        (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cpp_parquet_spark.engine import decode_table, encode_table, verify_roundtrip
from cpp_parquet_spark.partitioning import EncodeConfig
from cpp_parquet_spark.session import get_spark
from cpp_parquet_spark.synth import SF_ROWS, fixture_path, repofiles

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO_ROWS = int(os.environ.get("BENCH_REPOFILES_ROWS", "100000"))

# north-rule config: salted repartition on (repo, path-bucket). num_parts
# is bytes-planned per input (16 MiB target on this box vs the 64 MiB
# production default: per-part FSST training already amortizes at 16 MiB,
# and more, smaller parts smooth stragglers under co-tenant steal —
# measured 11-14 s -> 6.7-8.3 s on the 2 GB encode), floored at 2 tasks
# per core so every parallelism level stays busy.
_CONTENT_BYTES: int | None = None


def _repo_parts() -> int:
    from cpp_parquet_spark.partitioning import plan_num_parts
    return plan_num_parts(_CONTENT_BYTES or (248 << 20), target=16 << 20,
                          min_parts=2 * CPUS)


def _repo_cfg(table_name: str = "repofiles",
              overrides: dict | None = None) -> EncodeConfig:
    return EncodeConfig(keys=("repo",), salt_from=("path",), salt_buckets=32,
                        num_parts=_repo_parts(), order_keys=("path",),
                        codec_overrides=overrides or {},
                        table_name=table_name)


DOCS_CFG = EncodeConfig(keys=("source",), salt_from=("doc_id",), num_parts=16,
                        order_keys=("doc_id",), table_name="documents")
LINEITEM_CFG = EncodeConfig(keys=("l_returnflag",), salt_from=("l_orderkey",),
                            num_parts=32,
                            order_keys=("l_orderkey", "l_linenumber"),
                            table_name="lineitem")


def _force(df: DataFrame) -> int:
    """Force full materialization without driver collect."""
    return df.write.mode("overwrite").format("noop").save() or 0


def _repofiles_df(spark: SparkSession) -> DataFrame:
    path = _repofiles_parquet()
    return spark.read.parquet(path)


_REPO_PATH: str | None = None


def _repofiles_parquet() -> str:
    global _REPO_PATH
    if _REPO_PATH is None:
        if REPO_ROWS in SF_ROWS.values():
            sf = next(k for k, v in SF_ROWS.items() if v == REPO_ROWS)
            _REPO_PATH = fixture_path(sf)
        else:
            import pyarrow.parquet as pq
            from cpp_parquet_spark.synth import CACHE
            cache = os.path.abspath(CACHE)
            os.makedirs(cache, exist_ok=True)
            p = os.path.join(cache, f"repofiles_n{REPO_ROWS}.parquet")
            if not os.path.exists(p):
                # small row groups => parallel scan (see synth.fixture_path)
                pq.write_table(repofiles(REPO_ROWS, seed=42), p,
                               row_group_size=8192)
            _REPO_PATH = p
    return _REPO_PATH


_SIZE: dict | None = None


def q_encode_repofiles(spark: SparkSession) -> None:
    """HEADLINE: north-rule encode — auto-selected codecs over source
    code. Forces materialization through a sum aggregate (same full
    evaluation as a noop sink) so the run also yields the raw/encoded
    byte totals for the JSON ``size`` block."""
    global _SIZE
    df = _repofiles_df(spark)
    row = (encode_table(df, _repo_cfg())
           .agg(F.sum("raw_bytes").alias("raw"),
                F.sum("enc_bytes").alias("enc")).collect()[0])
    _SIZE = {"raw_bytes": int(row["raw"]), "enc_bytes": int(row["enc"]),
             "ratio": round(row["raw"] / row["enc"], 3)}


_SIZE_ZSTD: dict | None = None


def q_encode_repofiles_zstd(spark: SparkSession) -> None:
    """Auto codecs + E9 zstd block compression (round 3): the max-
    compression configuration. bss/listb byte-stream-split layouts kick
    in for float columns under the block codec; text pages get
    fsst-then-zstd. Records the size block for the JSON
    ``size.zstd_*`` ratio receipts."""
    global _SIZE_ZSTD
    df = _repofiles_df(spark)
    cfg = _repo_cfg("repofiles_zstd")
    from dataclasses import replace
    cfg = replace(cfg, block_codec="zstd")
    row = (encode_table(df, cfg)
           .agg(F.sum("raw_bytes").alias("raw"),
                F.sum("enc_bytes").alias("enc")).collect()[0])
    _SIZE_ZSTD = {"raw_bytes": int(row["raw"]), "enc_bytes": int(row["enc"]),
                  "ratio": round(row["raw"] / row["enc"], 3)}


def _standin_sizes() -> dict | None:
    """Stand-in reference writer (pyarrow, the toy cpp-parquet's codec
    set): PLAIN/UNCOMPRESSED file size + single-thread write wall over
    the same input — the BASELINE.md comparison, refreshed per run.
    Min-of-3 walls (same discipline as every engine wall: a single
    measurement swung 0.14-0.94 GB/s across r3 records under co-tenant
    bandwidth pressure, making the vs-reference ratio noise)."""
    import tempfile
    try:
        import pyarrow.parquet as pq
        tbl = pq.read_table(_repofiles_parquet())
        walls = []
        # tmpfs when available: the engine leg materializes through a
        # noop sink (no disk write), so the stand-in gets the same
        # courtesy — pure writer CPU, not /tmp disk writeback (measured
        # 0.05-0.09 GB/s on-disk vs ~1.6 GB/s tmpfs for the same call)
        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        with tempfile.TemporaryDirectory(dir=base) as td:
            for i in range(3):
                dst = os.path.join(td, f"standin{i}.parquet")
                t0 = time.monotonic()
                pq.write_table(tbl, dst, use_dictionary=False,
                               compression="NONE")
                walls.append(round(time.monotonic() - t0, 3))
            plain_bytes = os.path.getsize(dst)
        return {"plain_bytes": plain_bytes,
                "plain_write_s": min(walls),
                "plain_write_walls": walls}
    except Exception:
        return None


def q_encode_repofiles_plain(spark: SparkSession) -> None:
    """Apples-to-apples vs the stand-in reference writer: PLAIN-only
    encode (the toy cpp-parquet writes PLAIN, UNCOMPRESSED) — measures
    the pipeline ceiling without FSST's compression work."""
    df = _repofiles_df(spark)
    cfg = _repo_cfg("repofiles_plain",
                    {c: "plain" for c in
                     ("repo", "path", "commit", "lang", "content")})
    _force(encode_table(df, cfg))


def q_encode_repofiles_noshuffle(spark: SparkSession) -> None:
    """Shuffle-free ingest mode (part_id = scan split): the encode
    pipeline's ceiling with the exchange removed — the right mode for
    compaction-style re-encodes; the headline keeps the north-rule
    salted clustering."""
    df = _repofiles_df(spark)
    _force(encode_table(df, EncodeConfig(no_shuffle=True,
                                         table_name="repofiles_ns")))


def q_roundtrip_repofiles(spark: SparkSession) -> None:
    """Encode -> decode -> per-value sha256 verify on content.

    Pages are cached between encode and decode, matching the real pipeline
    where pages land on disk before any decode reads them."""
    df = _repofiles_df(spark)
    pages = encode_table(df, _repo_cfg())
    cols = pages._cps_columns
    pages = pages.cache()
    try:
        decoded = decode_table(pages, columns=cols)
        res = verify_roundtrip(df, decoded, "content")
        assert res["sha256_match_rate"] == 1.0, res
    finally:
        pages.unpersist()


_DECODE: dict | None = None
_AGGFAST: dict | None = None


def q_decode_repofiles(spark: SparkSession) -> None:
    """Decode throughput of the north-rule content column. Pages are
    pre-encoded and cached (untimed, mirroring pages already on disk);
    the timed leg is ``decode_table`` + one narrow byte-sum reduction,
    so ``decode_gbps`` in the JSON reads the decode kernels (FSST/dict/
    RLE/FOR expansion), not the verify join of ``roundtrip_repofiles``."""
    global _DECODE
    import time as _time
    df = _repofiles_df(spark)
    pages = encode_table(df, _repo_cfg(table_name="repofiles_dec"))
    cols = [ct for ct in pages._cps_columns if ct[0] == "content"]
    pages = pages.filter(F.col("column") == "content").cache()
    try:
        pages.count()
        # min-of-reps with a memcpy-bandwidth receipt per rep: a single
        # timed run is hostage to co-tenant bandwidth flares (recorded
        # 0.069 GB/s in r2 vs 0.212 clean-window) — same discipline as
        # the scaling probe's walls
        walls, bws, n = [], [], 0
        for _ in range(3):
            bws.append(round(_membw(), 1))
            t0 = _time.monotonic()
            n = (decode_table(pages, columns=cols)
                 .agg(F.sum(F.octet_length("content"))).collect()[0][0])
            walls.append(round(_time.monotonic() - t0, 3))
        _DECODE = {"decode_s": min(walls), "decoded_bytes": int(n),
                   "decode_walls": walls, "decode_membw": bws}
    finally:
        pages.unpersist()


def q_stats_select(spark: SparkSession) -> None:
    """Sampling pass + codec decision stats (E8/S6) over the north-rule table."""
    df = _repofiles_df(spark).sample(0.1, seed=42)
    stats = (df.groupBy("lang")
             .agg(F.count("*").alias("n"),
                  F.approx_count_distinct("content").alias("nd_content"),
                  F.sum(F.octet_length("content")).alias("bytes"),
                  F.avg(F.octet_length("content")).alias("avg_len")))
    _force(stats)


def q_encode_documents(spark: SparkSession) -> None:
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _force(encode_table(df, DOCS_CFG))


def q_encode_lineitem(spark: SparkSession) -> None:
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    _force(encode_table(df, LINEITEM_CFG))


def q_join_agg(spark: SparkSession) -> None:
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    _force(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("total")))


def q_dedup_minhash(spark: SparkSession) -> None:
    """MinHash+LSH near-dup over the documents fixture. (The synthetic
    north-rule content is pool-generated, so same-language files collide
    in nearly every LSH band and the candidate set goes quadratic — real
    corpora and the driver fixture have selective bands.)"""
    from cpp_parquet_spark.dedup import minhash_dedup_pairs
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _force(minhash_dedup_pairs(df, threshold=0.7))


def q_text_pipeline(spark: SparkSession) -> None:
    """Quality + fingerprint over the north-rule content (pure built-ins)."""
    from cpp_parquet_spark.textops import fingerprint, quality
    df = _repofiles_df(spark).select(
        F.xxhash64("repo", "path").alias("doc_id"),
        F.col("content").alias("text"), F.col("lang"))
    _force(quality(df))
    _force(fingerprint(df, prefix=256))


def q_pushdown(spark: SparkSession) -> None:
    """Range-clustered encode + zone-map pushdown decode: a repo-range
    predicate decodes only the parts whose zones intersect (20/64 at
    this scale; see BENCH.md)."""
    from cpp_parquet_spark.engine import decode_where
    from cpp_parquet_spark.partitioning import plan_range_bounds
    df = _repofiles_df(spark)
    bounds = plan_range_bounds(df, "repo", 16)
    cfg = EncodeConfig(range_on="repo", range_bounds=bounds,
                       salt_from=("path",), salt_buckets=4,
                       order_keys=("path",), table_name="repofiles_range")
    pages = encode_table(df, cfg).cache()
    try:
        pages.count()   # materialize once; the timed pushdown reads cache
        lo, hi = "org2/", "org3/"
        _force(decode_where(pages, "repo", lo=lo, hi=hi))
    finally:
        pages.unpersist()


def q_ann_topk(spark: SparkSession) -> None:
    from cpp_parquet_spark.similarity import (brute_topk, ivf_topk,
                                               lsh_topk, pq_topk)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _force(brute_topk(emb, [0, 1, 2, 3, 4], k=10))
    _force(lsh_topk(emb, [0, 1, 2, 3, 4], k=10))
    _force(ivf_topk(emb, [0, 1, 2, 3, 4], k=10, n_centroids=16, nprobe=4))
    _force(pq_topk(emb, [0, 1, 2, 3, 4], k=10, m=16, ksub=32, rerank=4))


def q_mix_pipeline(spark: SparkSession) -> None:
    """Deterministic training-mix assembly over the north-rule content:
    domain-rate downsample -> fractional upsample -> holdout split ->
    md5 global shuffle. Everything before the final range exchange is
    one codegen pass on the scan (plan-pinned shuffle-free)."""
    from cpp_parquet_spark import sampling
    df = _repofiles_df(spark).select(
        F.xxhash64("repo", "path").alias("doc_id"),
        F.col("lang").alias("source"), F.col("content").alias("text"))
    mixed = sampling.sample_domains(df, {"python": 0.5}, default_rate=0.9)
    mixed = sampling.upsample_domains(mixed, {"go": 1.5})
    mixed = sampling.split_holdout(mixed, eval_frac=0.01)
    _force(sampling.shuffle_order(mixed.filter(F.col("split") == "train")))


def q_dedup_lines(spark: SparkSession) -> None:
    """C4-style cross-doc line dedup over a deterministic 10% slice of
    the north-rule content (the pool-generated fixture duplicates code
    lines across nearly every file — orders of magnitude denser than a
    real corpus — so the slice keeps the bench wall proportionate while
    still exercising the hot-key owner aggregation)."""
    from cpp_parquet_spark import sampling
    from cpp_parquet_spark.dedup import dedup_lines
    df = _repofiles_df(spark).select(
        F.xxhash64("repo", "path").alias("doc_id"),
        F.col("content").alias("text"))
    _force(dedup_lines(sampling.sample_domains(df, {}, default_rate=0.1)))


def q_agg_fast(spark: SparkSession) -> None:
    """Metadata-only aggregate vs decode-path aggregate on the same
    int64 column (lineitem.l_partkey): ``column_agg_fast`` answers
    COUNT/SUM/AVG/MIN/MAX from the ``__agg__`` + zone sidecars with
    zero page blobs read; the scan leg decodes the column and
    aggregates it. The two sub-walls land in the JSON as
    ``agg_fast_meta_s`` / ``agg_fast_scan_s``. At THIS fixture scale
    both sit on the ~0.5 s local job-launch floor (600 k int64 values
    decode in <100 ms), so the walls are launch cost, not data cost —
    the structural win is pinned instead by
    tests/test_plans.py::test_column_agg_fast_never_reads_blobs: the
    meta plan's scans exclude the `data` blob column entirely, and on
    a 100 TB table the blob column IS the table."""
    global _AGGFAST
    import time as _time
    from cpp_parquet_spark.engine import column_agg_fast, decode_table
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cfg = EncodeConfig(keys=("l_returnflag",), salt_from=("l_orderkey",),
                       num_parts=32, table_name="lineitem_agg")
    pages = encode_table(df, cfg).cache()
    try:
        pages.count()
        cols = [ct for ct in pages._cps_columns if ct[0] == "l_partkey"]
        # min-of-reps on BOTH legs: a single cold run measures codegen/
        # JIT of the query shape, not the path's steady-state cost
        t_meta, t_scan, meta_row, scan_row = None, None, None, None
        for _ in range(3):
            t0 = _time.monotonic()
            meta_row = column_agg_fast(pages, "l_partkey",
                                       columns=pages._cps_columns
                                       ).collect()[0]
            w = _time.monotonic() - t0
            t_meta = w if t_meta is None else min(t_meta, w)
            t0 = _time.monotonic()
            scan_row = (decode_table(
                pages.filter(F.col("column") == "l_partkey"), columns=cols)
                .agg(F.count("l_partkey"), F.sum("l_partkey")).collect()[0])
            w = _time.monotonic() - t0
            t_scan = w if t_scan is None else min(t_scan, w)
        assert int(meta_row["sum_v"]) == int(scan_row[1]), "sum mismatch"
        _AGGFAST = {"agg_fast_meta_s": round(t_meta, 3),
                    "agg_fast_scan_s": round(t_scan, 3)}
    finally:
        pages.unpersist()


def q_dedup_spans(spark: SparkSession) -> None:
    """Duplicated-span coverage (ExactSubstr-lite) over a deterministic
    10% slice of the north-rule content — same slice discipline as
    q_dedup_lines (the synthetic fixture is orders of magnitude more
    duplicative than a real corpus)."""
    from cpp_parquet_spark import sampling
    from cpp_parquet_spark.dedup import dup_span_coverage
    df = _repofiles_df(spark).select(
        F.xxhash64("repo", "path").alias("doc_id"),
        F.col("content").alias("text"))
    _force(dup_span_coverage(sampling.sample_domains(df, {},
                                                     default_rate=0.1)))


_EXPORT: dict | None = None


def q_export_scan(spark: SparkSession) -> None:
    """Distributed STANDARD-parquet sink + import through our own
    writer/reader (cpp_parquet_spark.export): the 2 GB north-rule table
    lands as one real .parquet per partition (DLBA strings, zstd pages,
    Statistics + PageIndex), then scans back through our kernels.
    Apples-to-apples with the stand-in: BOTH paths produce standard
    parquet files; the stand-in is pyarrow single-thread, this is our
    writer on local[32]. Min-of-reps like every kernel wall."""
    global _EXPORT
    import shutil
    import tempfile as _tf
    import time as _time

    from cpp_parquet_spark.export import export_parquet, scan_parquet
    df = _repofiles_df(spark).cache()
    try:
        content_b = _CONTENT_BYTES or int(
            df.agg(F.sum(F.octet_length("content"))).collect()[0][0])
        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        ew, sw = [], []
        # 3 reps (r5: was 2): the first export wall flared 2.3x in the
        # r5-final window and min-of-2 left no clean second sample
        for _ in range(3):
            td = _tf.mkdtemp(dir=base)
            try:
                t0 = _time.monotonic()
                export_parquet(df, os.path.join(td, "out")).collect()
                ew.append(round(_time.monotonic() - t0, 3))
                t0 = _time.monotonic()
                n = (scan_parquet(spark, os.path.join(td, "out"),
                                  columns=["content"])
                     .agg(F.sum(F.octet_length("content")))
                     .collect()[0][0])
                sw.append(round(_time.monotonic() - t0, 3))
                assert n == content_b, (n, content_b)
            finally:
                shutil.rmtree(td, ignore_errors=True)
        _EXPORT = {"export_gbps": round(content_b / min(ew) / 1e9, 4),
                   "scan_gbps": round(content_b / min(sw) / 1e9, 4),
                   "export_walls": ew, "scan_walls": sw}
    finally:
        df.unpersist()


QUERIES = {
    "encode_repofiles": q_encode_repofiles,
    "encode_repofiles_zstd": q_encode_repofiles_zstd,
    "encode_repofiles_plain": q_encode_repofiles_plain,
    "encode_repofiles_noshuffle": q_encode_repofiles_noshuffle,
    "roundtrip_repofiles": q_roundtrip_repofiles,
    "decode_repofiles": q_decode_repofiles,
    "stats_select": q_stats_select,
    "encode_documents": q_encode_documents,
    "encode_lineitem": q_encode_lineitem,
    "join_agg": q_join_agg,
    "dedup_minhash": q_dedup_minhash,
    "text_pipeline": q_text_pipeline,
    "pushdown": q_pushdown,
    "ann_topk": q_ann_topk,
    "mix_pipeline": q_mix_pipeline,
    "dedup_lines": q_dedup_lines,
    "agg_fast": q_agg_fast,
    "dedup_spans": q_dedup_spans,
    "export_scan": q_export_scan,
}


def _membw_at(k: int, mb: int = 16, secs: float = 0.35) -> float:
    """Aggregate warmed-buffer memcpy GB/s at EXACTLY k threads (fresh
    buffers — unlike _membw's fixed-k cached probe, this reads the
    host's bandwidth-vs-parallelism curve). 16 MiB per buffer (2 per
    thread, ~1 GiB transient at k=32) — well past every cache level
    while leaving the probe itself unable to cause reclaim pressure."""
    import numpy as np
    from concurrent.futures import ThreadPoolExecutor
    bufs = []
    for _ in range(k):
        a = np.random.randint(0, 255, mb << 20, dtype=np.uint8)
        bufs.append((a, a.copy()))

    def run(ab):
        a, b = ab
        t0 = time.monotonic()
        n = 0
        while time.monotonic() - t0 < secs:
            np.copyto(b, a)
            n += 1
        return n * a.nbytes * 2

    with ThreadPoolExecutor(k) as ex:
        tot = sum(ex.map(run, bufs))
    return tot / secs / 1e9


_MEMBW_BUFS: list | None = None


def _membw(k: int = 4, mb: int = 64, secs: float = 0.3) -> float:
    """Available host memory bandwidth right now (GB/s aggregate, k
    threads copying warmed buffers — numpy releases the GIL on copyto).

    Why this exists: the box shares a hypervisor with co-tenants whose
    bandwidth pressure is invisible to /proc/stat (no steal, no busy),
    yet collapses aggregate memcpy from ~200 GB/s to ~20 GB/s (measured
    2026-08-17). Every wall in the scaling probe records the bandwidth
    in effect so a contaminated leg is identifiable as such. Buffers are
    touched once up front — an unwarmed buffer measures page faults, not
    bandwidth."""
    import numpy as np
    from concurrent.futures import ThreadPoolExecutor
    global _MEMBW_BUFS
    if _MEMBW_BUFS is None:
        _MEMBW_BUFS = []
        for _ in range(k):
            a = np.random.randint(0, 255, mb << 20, dtype=np.uint8)
            _MEMBW_BUFS.append((a, a.copy()))

    def run(ab):
        a, b = ab
        t0 = time.monotonic()
        n = 0
        while time.monotonic() - t0 < secs:
            np.copyto(b, a)
            n += 1
        return n * a.nbytes * 2

    with ThreadPoolExecutor(k) as ex:
        tot = sum(ex.map(run, _MEMBW_BUFS))
    return tot / secs / 1e9


def _cpu_busy_frac(interval: float = 2.0) -> float:
    """Instantaneous host CPU busy fraction from /proc/stat (the box
    shares a kernel with co-tenant processes invisible to ps, so this
    sees their load directly — unlike loadavg, it has no decay lag and
    is not polluted by our own just-finished leg)."""
    def snap():
        parts = open("/proc/stat").readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + vals[4]            # idle + iowait
        return idle, sum(vals)
    try:
        i0, t0 = snap()
        time.sleep(interval)
        i1, t1 = snap()
        return 1.0 - (i1 - i0) / max(t1 - t0, 1)
    except (OSError, IndexError, ValueError):
        return 0.0


def _wait_quiet(limit: float = 0.15, timeout: float = 75.0,
                deadline: float | None = None) -> None:
    """Best-effort dodge of co-tenant load flares before a probe run.
    Never waits past ``deadline`` (the probe's overall budget) — when the
    box stays busy, best-of-reps is the fallback, not more waiting."""
    t0 = time.monotonic()
    if deadline is not None:
        timeout = max(0.0, min(timeout, deadline - t0))
    while _cpu_busy_frac() > limit and time.monotonic() - t0 < timeout:
        time.sleep(8)


def _probe_level(cpus: int, rows: int, cb: int, reps: int,
                 deadline: float) -> dict | None:
    """Timed encode walls at local[cpus] on the rows-row input, run
    IN-PROCESS in the bench's own (already JIT-warm) JVM: Spark local
    mode allows stop()-then-recreate with a different master in one JVM,
    so a level costs context spin-up (~2 s) instead of a fresh-JVM leg
    (~25 s startup + ~20 s of C2 compilation that used to land inside
    the first timed wall and made fresh-JVM probes 2-3x noisier than the
    converged engine — measured 49.7/23.7/16.0 s across reps of the
    identical 2 GB encode in one JVM).

    Each context runs a medium warm encode (spawns + warms the level's
    Python workers), then up to ``reps`` timed (auto, plain) runs; a
    memcpy-bandwidth sample is recorded before each so co-tenant
    bandwidth pressure — this box's dominant noise source, invisible to
    /proc/stat — is visible next to every wall."""
    from cpp_parquet_spark.partitioning import plan_num_parts
    from cpp_parquet_spark.synth import fixture_path
    spark = get_spark(f"local[{cpus}]", task_cpus=1)
    try:
        warm = spark.read.parquet(fixture_path("sf0.1"))
        _force(encode_table(warm, EncodeConfig(
            keys=("repo",), salt_from=("path",), salt_buckets=32,
            num_parts=4 * cpus, table_name="probe_warm")))
        df = spark.read.parquet(_repofiles_parquet_n(rows))
        nparts = plan_num_parts(cb, target=16 << 20, min_parts=2 * cpus)

        def cfg_for(table: str, overrides: dict | None = None):
            return EncodeConfig(keys=("repo",), salt_from=("path",),
                                salt_buckets=32, num_parts=nparts,
                                order_keys=("path",),
                                codec_overrides=overrides or {},
                                table_name=table)

        cfg = cfg_for("probe")
        plain_cfg = cfg_for("probe_plain",
                            {c: "plain" for c in
                             ("repo", "path", "commit", "lang",
                              "content")})
        walls, pwalls, bws = [], [], []
        for rep in range(reps):
            if rep and time.monotonic() > deadline:
                break
            bws.append(round(_membw(), 1))
            t0 = time.monotonic()
            _force(encode_table(df, cfg))
            walls.append(round(time.monotonic() - t0, 3))
            t0 = time.monotonic()
            _force(encode_table(df, plain_cfg))
            pwalls.append(round(time.monotonic() - t0, 3))
        return {"walls": walls, "plain_walls": pwalls, "membw": bws}
    finally:
        spark.stop()


def _repofiles_parquet_n(rows: int) -> str:
    """Synth-cache path for an arbitrary row count (probe input)."""
    global REPO_ROWS, _REPO_PATH
    saved_rows, saved_path = REPO_ROWS, _REPO_PATH
    REPO_ROWS, _REPO_PATH = rows, None
    try:
        return _repofiles_parquet()
    finally:
        REPO_ROWS, _REPO_PATH = saved_rows, saved_path


def _pair(levels: dict[int, dict], n: int, n4: int, cb: int) -> dict | None:
    """N vs 4N efficiency from the per-level best walls."""
    a, b = levels.get(n), levels.get(n4)
    if not a or not b or not a["walls"] or not b["walls"]:
        return None
    tn, tn4 = min(a["walls"]), min(b["walls"])
    pn, pn4 = min(a["plain_walls"]), min(b["plain_walls"])
    ratio = n4 / n
    return {
        "content_bytes": cb, "n_cpus": n, "n4_cpus": n4,
        "t_n": tn, "t_n4": tn4,
        "gbps_n": round(cb / tn / 1e9, 4),
        "gbps_n4": round(cb / tn4 / 1e9, 4),
        "efficiency": round((tn / tn4) / ratio, 3),
        "plain": {"t_n": pn, "t_n4": pn4,
                  "gbps_n": round(cb / pn / 1e9, 4),
                  "gbps_n4": round(cb / pn4 / 1e9, 4),
                  "efficiency": round((pn / pn4) / ratio, 3)},
        "walls_n": a["walls"], "walls_n4": b["walls"],
        "membw_n": a["membw"], "membw_n4": b["membw"],
    }


def _scaling_probe() -> dict | None:
    """Two N-vs-4N pairs (north-rule scaling criterion, sandbox form):

    - primary local[2] vs local[8], 800k rows (2 GB) — both levels sit
      inside the capacity envelope where this host's memory bandwidth
      still scales (memcpy aggregate rises to ~8-16 threads), so the
      pair reads the ENGINE's scaling;
    - secondary local[8] vs local[32] — uses the whole box. The host's
      aggregate memcpy bandwidth at 32 threads swings ~10x with
      co-tenant pressure (22-214 GB/s sampled minutes apart,
      2026-08-17), so this pair reads the HOST under load as much as the
      engine; the per-rep ``membw`` samples say which. The engine's own
      kernels measure 0.87 efficiency 8->32 when run bare
      (multiprocessing, BENCH.md).

    Levels run interleaved across outer rounds so each pair samples
    comparable bandwidth windows; walls are min-of-reps per level.
    """
    rows_big = int(os.environ.get("BENCH_SCALING_ROWS", "800000"))
    budget = float(os.environ.get("BENCH_SCALING_BUDGET", "900"))
    rounds = int(os.environ.get("BENCH_SCALING_ROUNDS", "2"))
    reps = int(os.environ.get("BENCH_SCALING_REPS", "2"))
    deadline = time.monotonic() + budget
    if REPO_ROWS == rows_big and _CONTENT_BYTES:
        cb = _CONTENT_BYTES
    else:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        tbl = pq.read_table(_repofiles_parquet_n(rows_big),
                            columns=["content"])
        cb = int(pc.sum(pc.binary_length(tbl.column("content"))).as_py())
    levels: dict[int, dict] = {}
    for rnd in range(rounds):
        for cpus in (2, 8, 32):
            if rnd and time.monotonic() > deadline:
                break
            # local[2] reps cost ~2 min each; one per round (two rounds
            # still give two window samples)
            r = _probe_level(cpus, rows_big, cb,
                             1 if cpus == 2 else reps, deadline)
            if r is None:
                continue
            if cpus in levels:
                for k in ("walls", "plain_walls", "membw"):
                    levels[cpus][k].extend(r[k])
            else:
                levels[cpus] = r
    primary = _pair(levels, 2, 8, cb)
    secondary = _pair(levels, 8, 32, cb)

    def _window_ok(p: dict) -> bool:
        """True when the 32-leg best wall ran in a bandwidth window at
        least comparable to the 8-leg best's (the membw sample is taken
        immediately before each timed wall)."""
        i_n = p["walls_n"].index(p["t_n"])
        i_4 = p["walls_n4"].index(p["t_n4"])
        return p["membw_n4"][i_4] >= 0.9 * p["membw_n"][i_n]

    # clean-window retry for the wide pair: co-tenant pressure swings
    # this host's 32-thread memcpy aggregate ~10x, so keep sampling
    # cheap 32-leg reps (plus an 8-leg every other retry, so both ends
    # track the same window regime) until the best 32 wall carries a
    # bandwidth receipt >= the best 8 wall's — or the budget runs out,
    # in which case the receipts in the JSON prove the host never
    # offered a clean window. (No efficiency target in the loop: the
    # in-box 8->32 ceiling is the HARDWARE's own memcpy scaling, ~0.5
    # on this box — see host_membw_curve / engine_vs_host below.)
    retries = 0
    while (secondary is not None and retries < 8
           and time.monotonic() < deadline
           and not _window_ok(secondary)):
        retries += 1
        r = _probe_level(32, rows_big, cb, 1, deadline)
        if r:
            for k in ("walls", "plain_walls", "membw"):
                levels[32][k].extend(r[k])
        if retries % 2 == 0:
            r8 = _probe_level(8, rows_big, cb, 1, deadline)
            if r8:
                for k in ("walls", "plain_walls", "membw"):
                    levels[8][k].extend(r8[k])
        secondary = _pair(levels, 8, 32, cb)
    if secondary is not None:
        secondary["clean_window"] = _window_ok(secondary)
        secondary["retries"] = retries
        # thread-matched host bandwidth curve: the engine's encode is
        # memory-traffic-bound, so its N->4N ceiling is the HARDWARE's
        # memcpy scaling at the same thread counts (this box: 8->32
        # memcpy efficiency ~0.5 — a single shared memory subsystem,
        # unlike real 4N EXECUTORS where each node brings its own bus).
        # engine_vs_host >= ~0.9 says the engine loses nothing beyond
        # what bare memcpy loses.
        curve = {k: round(_membw_at(k), 1) for k in (2, 8, 32)}
        secondary["host_membw_curve"] = curve
        hw_eff = (curve[32] / curve[8]) / 4 if curve[8] else None
        secondary["host_membw_8_32_efficiency"] = (
            round(hw_eff, 3) if hw_eff else None)
        if hw_eff:
            secondary["engine_vs_host"] = round(
                secondary["efficiency"] / hw_eff, 3)

    if primary is None and secondary is None:
        return None
    out = {"rows": rows_big, "primary": primary, "secondary": secondary}
    head = primary or secondary
    out["efficiency"] = head["efficiency"]
    return out


def main() -> None:
    only = [s for s in os.environ.get("BENCH_ONLY", "").split(",") if s]
    names = only or list(QUERIES)
    # hybrid JVM+Python encode stages: 2-core task slots stop the 2x
    # thread oversubscription (serde thread + Python worker per task)
    # task_cpus=1 everywhere: with 8 MB scan splits (session.py) the
    # scan stage is as wide as the box and plain 1-core slots win —
    # measured 13.9 s vs 38 s at local[32] on the 2 GB auto encode (the
    # round-1 task.cpus=2 setting was compensating for a 4-task scan)
    spark = get_spark(f"local[{CPUS}]", task_cpus=1)
    # warm up JVM + Python workers so timings measure the kernels, not
    # startup; enough parts that every worker slot spawns and imports
    warm = spark.createDataFrame([(str(i), "warm" * 10) for i in range(4096)],
                                 "repo string, content string") \
        .withColumn("path", F.lit("p")).withColumn("commit", F.lit("c")) \
        .withColumn("lang", F.lit("txt"))
    _force(encode_table(warm, EncodeConfig(keys=("repo",), salt_from=(),
                                           num_parts=4 * CPUS,
                                           table_name="warm")))
    # medium warm (~23 MB): the tiny warm above spawns workers but does
    # not push the JVM serde/shuffle loops past the C2 JIT threshold —
    # without this, the first big encode absorbs ~2-3x of compilation
    # wall (measured 49.7/23.7/16.0 s across identical 2 GB reps)
    medium = spark.read.parquet(fixture_path("sf0.01"))
    _force(encode_table(medium, EncodeConfig(
        keys=("repo",), salt_from=("path",), salt_buckets=32,
        num_parts=2 * CPUS, table_name="warm_med")))
    if not only or "dedup_minhash" in names:
        # the dedup/text kernels import different worker-side modules than
        # the encode path; a 64-doc pass warms them so the timed query
        # measures kernels, not module imports (measured 27 s cold vs
        # 8.5 s warm on the sf0.1 minhash at local[32])
        try:
            from cpp_parquet_spark.dedup import minhash_dedup_pairs
            docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
                .limit(64).cache()
            docs.count()
            _force(minhash_dedup_pairs(docs, threshold=0.7))
            docs.unpersist()
        except Exception:
            pass

    content_bytes = _repofiles_df(spark).agg(
        F.sum(F.octet_length("content"))).collect()[0][0]
    global _CONTENT_BYTES
    _CONTENT_BYTES = int(content_bytes)

    # rough clean-run walls (measured 2026-08-17, quiet box) — a wall
    # beyond FLARE_FACTOR x these almost certainly rode a co-tenant
    # bandwidth flare (BENCH.md "Measurement caveat"); such queries get
    # ONE re-run after the idle gate and the min is reported, with the
    # re-run recorded in `flare_reruns` so the JSON stays honest
    # EVERY query has an entry (VERDICT r3 item 4: the committed r3
    # record caught the slow tail of queries with no rerun bound —
    # dedup_minhash 8.4 s clean vs 22.2 s recorded). Values = r3
    # clean-window walls rounded up a little.
    expected = {
        "encode_repofiles": 2.5, "encode_repofiles_zstd": 2.5,
        "encode_repofiles_plain": 1.5,
        "encode_repofiles_noshuffle": 1.8, "roundtrip_repofiles": 4.5,
        # decode runs 3 reps internally (min-of-reps handles flares
        # itself, so no outer flare-rerun wanted -> generous bound)
        "decode_repofiles": 18.0,
        "stats_select": 0.8, "encode_documents": 0.8,
        "encode_lineitem": 2.0, "join_agg": 0.8, "dedup_minhash": 9.0,
        "text_pipeline": 8.5, "pushdown": 5.5, "ann_topk": 5.0,
        "mix_pipeline": 3.0, "dedup_lines": 7.0,
        "agg_fast": 8.5, "dedup_spans": 8.0,
        # runs 2 internal reps, min-of-reps inside -> generous bound
        "export_scan": 30.0,
    }
    flare_factor = 2.0

    times: dict[str, float] = {}
    busy_at: dict[str, float] = {}
    flare_reruns: dict[str, list[float]] = {}
    for name in names:
        if not only:
            # brief idle gate so a co-tenant flare doesn't inflate one
            # query's wall by 3-7x (bounded: worst case +25 s per query;
            # the wait itself is excluded from every reported number —
            # kept short because on days with persistent ~0.3 background
            # steal the gate never opens and waiting longer just delays
            # the whole sweep)
            _wait_quiet(limit=0.2, timeout=25.0)
            # ambient co-tenant load going into the query (our own job is
            # idle here): lets a reader discount a flare-inflated wall
            busy_at[name] = round(_cpu_busy_frac(1.0), 2)
        t0 = time.monotonic()
        QUERIES[name](spark)
        wall = round(time.monotonic() - t0, 3)
        exp = expected.get(name)
        if not only and exp is not None and wall > flare_factor * exp:
            _wait_quiet(limit=0.2, timeout=25.0)
            t0 = time.monotonic()
            QUERIES[name](spark)
            wall2 = round(time.monotonic() - t0, 3)
            flare_reruns[name] = [wall, wall2]
            wall = min(wall, wall2)
        times[name] = wall
    total = round(sum(times.values()), 3)

    gbps = None
    if "encode_repofiles" in times and times["encode_repofiles"] > 0:
        gbps = round(content_bytes / times["encode_repofiles"] / 1e9, 4)
    spark.stop()

    out = {
        "metric": "bench_total_wall", "value": total, "unit": "sec",
        "queries": times, "sf": None,
        "encode_gbps": gbps, "content_bytes": int(content_bytes),
        "cpus": CPUS, "repofiles_rows": REPO_ROWS,
    }
    if _DECODE is not None and _DECODE["decode_s"] > 0:
        out["decode_gbps"] = round(
            _DECODE["decoded_bytes"] / _DECODE["decode_s"] / 1e9, 4)
        out["decode_s"] = _DECODE["decode_s"]
        out["decode_walls"] = _DECODE.get("decode_walls")
        out["decode_membw"] = _DECODE.get("decode_membw")
    if _AGGFAST is not None:
        out.update(_AGGFAST)
    if _EXPORT is not None:
        out["export_gbps"] = _EXPORT["export_gbps"]
        out["scan_gbps"] = _EXPORT["scan_gbps"]
        out["export_walls"] = _EXPORT["export_walls"]
        out["scan_walls"] = _EXPORT["scan_walls"]
    if busy_at:
        out["host_busy_at_query_start"] = busy_at
    if flare_reruns:
        out["flare_reruns"] = flare_reruns
    if _SIZE is not None:
        size = dict(_SIZE)
        standin = (None if os.environ.get("BENCH_STANDIN", "1") == "0"
                   else _standin_sizes())
        if standin is not None:
            size.update(standin)
            size["enc_vs_standin"] = round(
                size["enc_bytes"] / standin["plain_bytes"], 3)
            size["standin_gbps"] = round(
                content_bytes / standin["plain_write_s"] / 1e9, 4)
        if _SIZE_ZSTD is not None:
            size["zstd_enc_bytes"] = _SIZE_ZSTD["enc_bytes"]
            size["zstd_ratio"] = _SIZE_ZSTD["ratio"]
            if standin is not None:
                size["zstd_vs_standin"] = round(
                    _SIZE_ZSTD["enc_bytes"] / standin["plain_bytes"], 3)
        out["size"] = size
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        out["sf"] = float(sf)
    except ValueError:
        out["sf"] = sf

    if not only and os.environ.get("BENCH_SCALING", "1") != "0":
        scaling = _scaling_probe()
        if scaling is not None:
            out["scaling"] = scaling
            # headline throughput from the 2 GB local[32] legs (kernel-
            # bound), not the overhead-dominated 248 MB sweep
            sec = scaling.get("secondary")
            if sec is not None:
                out["encode_gbps"] = sec["gbps_n4"]
                out["encode_plain_gbps"] = sec["plain"]["gbps_n4"]

    # artifact contract (VERDICT r3 item 3): the FULL record — per-rep
    # walls, membw receipts, busy maps, host curves — goes to a file; the
    # LAST stdout line is a COMPACT headline JSON small enough for the
    # driver's capture window (r3's everything-on-one-line record outgrew
    # it and BENCH_r03.json landed unparseable).
    # BENCH_ONLY partial runs get their own default receipts file so a
    # quick diagnostic never clobbers the last FULL run's claim record
    default_name = "BENCH_local_only.json" if only else \
        "BENCH_local_last.json"
    receipts_path = os.environ.get("BENCH_RECEIPTS",
                                   os.path.join(os.path.dirname(
                                       os.path.abspath(__file__)),
                                       default_name))
    try:
        with open(receipts_path, "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        receipts_path = None
    head = {k: out.get(k) for k in
            ("metric", "value", "unit", "queries", "sf", "encode_gbps",
             "encode_plain_gbps", "decode_gbps", "export_gbps",
             "scan_gbps", "content_bytes", "cpus",
             "agg_fast_meta_s", "agg_fast_scan_s")
            if out.get(k) is not None}
    if "size" in out:
        head["size"] = {k: out["size"][k] for k in
                        ("ratio", "zstd_ratio", "enc_vs_standin",
                         "zstd_vs_standin", "standin_gbps")
                        if k in out["size"]}
    sc = out.get("scaling")
    if sc:
        head["scaling"] = {"efficiency": sc.get("efficiency")}
        for leg in ("primary", "secondary"):
            p = sc.get(leg)
            if p:
                head["scaling"][leg] = {
                    k: p[k] for k in
                    ("n_cpus", "n4_cpus", "gbps_n", "gbps_n4", "efficiency",
                     "clean_window", "engine_vs_host") if k in p}
    if receipts_path:
        head["receipts"] = receipts_path
    print(json.dumps(head, separators=(",", ":")))


if __name__ == "__main__":
    main()
