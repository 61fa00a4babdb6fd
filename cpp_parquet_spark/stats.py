"""Cluster-level sampling stats pass + codec decisions (E8/S6, north
rule: "a sampling-based codec-selection pass computes per-partition column
statistics (cardinality, run-length histograms, byte-frequency tables)
and auto-picks dict vs RLE vs FSST vs bit-pack vs FOR per column chunk").

Pipeline shape (SURVEY.md §3.3)::

    df.sample(fraction, seed)                  # narrow
      -> with_part_id + cluster_by_part        # ONE shuffle; each part_id
                                               # lands whole in one task
      -> mapInArrow(stats kernel)              # per (part, column) stats
      -> decide_codecs (pure expression)       # deterministic thresholds
      -> small decisions table -> driver dict  # fed to the encode kernel

Because parts are clustered before the kernel runs, each task sees every
sampled row of its parts, so per-(part, column) statistics are final — no
merge aggregation needed afterwards. Determinism: seeded sample, seeded
nothing-else; identical input -> identical decisions (resume-stable,
SURVEY.md §7 M5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .codecs import pagecodec
from .codecs.bitpack import bit_width_for
from .partitioning import EncodeConfig, cluster_by_part, with_part_id

STATS_SCHEMA = T.StructType([
    T.StructField("part_id", T.IntegerType()),
    T.StructField("column", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("n_values", T.LongType()),
    T.StructField("n_nulls", T.LongType()),
    T.StructField("total_bytes", T.LongType()),
    T.StructField("ndv", T.LongType()),          # exact on the sample
    T.StructField("mean_run", T.DoubleType()),   # run-length histogram mean
    T.StructField("byte_entropy", T.DoubleType()),  # bits/byte (strings)
    T.StructField("min_v", T.DoubleType()),
    T.StructField("max_v", T.DoubleType()),
    T.StructField("delta_bits", T.DoubleType()),   # bit width of diff span
    T.StructField("dec_scale", T.DoubleType()),    # 10^e decimal scale, 0=no
    T.StructField("prefix_frac", T.DoubleType()),  # shared-prefix byte frac
])

_STATS_ARROW = pa.schema([
    ("part_id", pa.int32()), ("column", pa.string()), ("type", pa.string()),
    ("n_values", pa.int64()), ("n_nulls", pa.int64()),
    ("total_bytes", pa.int64()), ("ndv", pa.int64()),
    ("mean_run", pa.float64()), ("byte_entropy", pa.float64()),
    ("min_v", pa.float64()), ("max_v", pa.float64()),
    ("delta_bits", pa.float64()), ("dec_scale", pa.float64()),
    ("prefix_frac", pa.float64()),
])


def _col_stats(arr: pa.Array, tag: str) -> dict:
    n = len(arr)
    nulls = arr.null_count
    work = arr.drop_null() if nulls else arr
    out = {"n_values": n, "n_nulls": nulls, "ndv": 0, "mean_run": 1.0,
           "byte_entropy": 0.0, "min_v": 0.0, "max_v": 0.0, "total_bytes": 0,
           "delta_bits": 64.0, "dec_scale": 0.0, "prefix_frac": 0.0}
    if len(work) == 0:
        return out
    if pagecodec.is_dec38(tag):
        # wide decimals are PLAIN-passthrough only (legal_codecs) — the
        # selector never consults these stats, so skip the object-array
        # conversion a decimal128 to_numpy would cost
        out["total_bytes"] = 16 * len(work)
        return out
    if tag in pagecodec.ARRS_TAGS:
        offs = np.frombuffer(work.buffers()[1], np.int32,
                             count=len(work) + 1,
                             offset=work.offset * 4).astype(np.int64)
        lens = np.diff(offs)
        child = work.flatten()
        cl = child.cast(pa.large_binary()) if not pa.types.is_large_binary(
            child.type) else child
        out["total_bytes"] = int(pa.compute.sum(
            pa.compute.binary_length(cl)).as_py() or 0) + 4 * len(child)
        out["ndv"] = int(np.unique(lens).shape[0])   # distinct list lens
        if lens.shape[0]:
            out["min_v"], out["max_v"] = float(lens.min()), float(lens.max())
        return out
    if tag in pagecodec.ARR_TAGS:
        w = pagecodec.ARR_ELEM_W[tag]
        offs = np.frombuffer(work.buffers()[1], np.int32,
                             count=len(work) + 1,
                             offset=work.offset * 4).astype(np.int64)
        lens = np.diff(offs)
        out["total_bytes"] = int(lens.sum()) * w
        out["ndv"] = int(np.unique(lens).shape[0])   # distinct dims
        out["min_v"], out["max_v"] = float(lens.min()), float(lens.max())
        return out
    if tag in pagecodec.STR_TAGS:
        la = work.cast(pa.large_binary())
        offs = np.frombuffer(la.buffers()[1], np.int64, count=len(la) + 1,
                             offset=la.offset * 8)
        data = np.frombuffer(la.buffers()[2], np.uint8,
                             count=int(offs[-1]))[int(offs[0]):]
        out["total_bytes"] = int(data.shape[0])
        freq = np.bincount(data, minlength=256)   # the byte-frequency table
        p = freq[freq > 0] / max(data.shape[0], 1)
        out["byte_entropy"] = float(-(p * np.log2(p)).sum())
        out["ndv"] = int(pa.compute.count_distinct(work).as_py())
        # run lengths over the value sequence (dictionary codes)
        codes = work.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        runs = int((codes[1:] != codes[:-1]).sum()) + 1
        out["mean_run"] = float(codes.shape[0] / runs)
        lens = np.diff(offs)
        out["min_v"], out["max_v"] = float(lens.min()), float(lens.max())
        # shared-prefix byte fraction with the previous value: the sample
        # rides cluster_by_part's (part, order_keys) sort, so a column
        # sorted for encode is sorted here too and adjacency transfers
        # (understated — sampled neighbours sit farther apart). Reuses the
        # codec's own kernel, so cap/restart behavior matches exactly.
        if data.shape[0]:
            from .codecs.prefix import _common_prefixes
            starts = np.zeros(lens.shape[0], dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            cp = _common_prefixes(data, starts, lens)
            out["prefix_frac"] = float(cp.sum() / data.shape[0])
    else:
        if tag in ("ts", "tsn"):
            work = work.cast(pa.int64())
        elif tag == "date":
            work = work.cast(pa.int32())
        if pagecodec.is_dec(tag):
            v = pagecodec.dec_unscaled(work)
        else:
            v = work.to_numpy(zero_copy_only=False)
        if tag == "bool":
            v = v.astype(np.int64)
        out["total_bytes"] = int(v.shape[0] * v.dtype.itemsize)
        if np.issubdtype(v.dtype, np.floating) and v.shape[0]:
            from .codecs.dfloat import find_scale
            sc = find_scale(np.asarray(v, dtype=np.float64))
            out["dec_scale"] = float(sc) if sc is not None else 0.0
        runs = int((v[1:] != v[:-1]).sum()) + 1
        out["mean_run"] = float(v.shape[0] / runs)
        out["ndv"] = int(np.unique(v).shape[0])
        out["min_v"], out["max_v"] = float(v.min()), float(v.max())
        if v.shape[0] > 1 and np.issubdtype(v.dtype, np.integer):
            uu = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)
            d = (uu[1:] - uu[:-1]).view(np.int64)
            dspan = (int(d.max()) - int(d.min())) & 0xFFFFFFFFFFFFFFFF
            out["delta_bits"] = float(dspan.bit_length())
    return out


def column_stats(df: DataFrame, cfg: EncodeConfig, fraction: float = 0.05,
                 seed: int = 42) -> DataFrame:
    """Per-(part_id, column) statistics over a seeded sample."""
    cols, tags = [], []
    for f in df.schema.fields:
        tag = pagecodec.spark_type_tag(f.dataType)
        if tag is not None:
            cols.append(f.name), tags.append(tag)
    # hash-based sampling, NOT df.sample(): Spark 4.1's Sample re-salts its
    # seed per query execution (verified: spark.range(...).sample(0.5, 42)
    # differs across two collects), which would break decision determinism
    # and resume-stable reruns. xxhash64 of the row is exactly reproducible.
    sampled = df.select(*cols)
    if fraction < 1.0:
        keep = F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(seed)),
                      F.lit(1_000_000)) < int(fraction * 1_000_000)
        sampled = sampled.filter(keep)
    prepared = cluster_by_part(with_part_id(sampled, cfg), cfg)

    def kernel(batches):
        acc: dict[tuple[int, str], list] = {}
        for batch in batches:
            pids = batch.column("__part_id").to_numpy(zero_copy_only=False)
            if pids.shape[0] == 0:
                continue
            bounds = np.flatnonzero(np.diff(pids)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [pids.shape[0]]))
            for s, e in zip(starts.tolist(), ends.tolist()):
                part = int(pids[s])
                for col, tag in zip(cols, tags):
                    arr = pagecodec.to_arrow(batch.column(col).slice(s, e - s),
                                             tag)
                    acc.setdefault((part, col), []).append((tag, arr))
        rows = {k: [] for k in _STATS_ARROW.names}
        for (part, col), chunks in sorted(acc.items()):
            tag = chunks[0][0]
            merged = pa.chunked_array([a for _, a in chunks]).combine_chunks()
            st = _col_stats(merged, tag)
            rows["part_id"].append(part)
            rows["column"].append(col)
            rows["type"].append(tag)
            for k in ("n_values", "n_nulls", "total_bytes", "ndv",
                      "mean_run", "byte_entropy", "min_v", "max_v",
                      "delta_bits", "dec_scale", "prefix_frac"):
                rows[k].append(st[k])
        if rows["part_id"]:
            yield pa.RecordBatch.from_pydict(rows, schema=_STATS_ARROW)

    return prepared.mapInArrow(kernel, STATS_SCHEMA)


def decide_codecs(stats: DataFrame,
                  block_codec: str | None = None) -> DataFrame:
    """Deterministic decision expression over the stats table — the
    plan-level mirror of select.choose_codec's page-level measurement.

    Thresholds: RLE when runs dominate; dict when the sampled cardinality
    is low relative to count; FOR/bit-pack for narrow int ranges; FSST for
    compressible text (entropy under ~6.2 bits/byte — source code sits
    around 4-5); PLAIN otherwise."""
    nd, n = F.col("ndv"), F.col("n_values")
    span_bits = F.ceil(F.log2(F.greatest(F.col("max_v") - F.col("min_v") + 1,
                                         F.lit(2.0))))
    is_int = (F.col("type").isin("i64", "i32", "ts", "tsn", "date")
              | F.col("type").startswith("dec:"))
    is_str = F.col("type").isin("str", "bin")
    # with an E9 outer block codec configured, byte-stream-split layouts
    # (parquet.thrift:620-630) become the float fallback: size-neutral on
    # their own, but the grouped exponent/sign byte planes compress far
    # better under zstd/zlib than interleaved PLAIN floats
    arr_codec = "listb" if block_codec else "listf"
    float_fallback = "bss" if block_codec else "plain"
    is_float = F.col("type").isin("f64", "f32")
    decision = (
        F.when(F.col("type").isin("arrf32", "arrf64"), arr_codec)
        .when(F.col("type").isin("arrs", "arrb"), "lists")
        .when(F.col("type").startswith("arri"), "listi")
        .when(F.col("type") == "bool", "rle")
        # rle is only legal for int/bool tags (pagecodec.LEGAL); gating the
        # run rule keeps run-heavy float/string chunks flowing to their own
        # dfloat/dict/fsst branches instead of an illegal plan the kernel
        # would discard
        .when(is_int & (F.col("mean_run") >= 4.0), "rle")
        .when(is_int & (nd <= F.greatest(n / 2, F.lit(1))) & (nd <= 65536)
              & (span_bits > 20), "dict")
        .when(is_int & (F.col("delta_bits") + 2 < span_bits), "delta")
        .when(is_int & (span_bits <= 20), "for")
        .when(is_int, "for")
        .when(is_str & (nd <= n / 2) & (nd <= 65536), "dict")
        # front coding vs FSST by estimated ratio: prefix leaves
        # (1 - prefix_frac) of the bytes; FSST's measured ratio on text
        # tracks byte_entropy/8 closely (source code: entropy ~5 ->
        # ratio ~0.62). The 0.3 floor keeps marginal wins at the
        # page-level measured comparison instead of pinning the plan.
        .when(is_str & (F.col("prefix_frac") >= 0.3)
              & (1.0 - F.col("prefix_frac") < F.col("byte_entropy") / 8.0),
              "prefix")
        .when(is_str & (F.col("byte_entropy") <= 6.2), "fsst")
        .when(is_float & (F.col("dec_scale") > 0), "dfloat")
        .when(is_float & (nd <= n / 8), "dict")
        .when(is_float, float_fallback)
        .otherwise("plain"))
    return stats.select("part_id", "column", decision.alias("codec"))


def suggest_block_codec(stats: DataFrame,
                        entropy_max: float = 6.5,
                        prefer: str = "zstd",
                        float_frac_min: float = 0.5) -> str | None:
    """E9 stats-pass trigger: recommend outer block compression when the
    sampled bytes still carry slack. Two independent signals:

    - string/binary byte entropy under ``entropy_max`` bits/byte (above
      that, general-purpose compression mostly spins);
    - float / float-array bytes are at least ``float_frac_min`` of the
      sampled table — a block codec is what unlocks the byte-stream-split
      layouts (bss/listb, SURVEY §2.1 E10), whose grouped exponent/sign
      planes compress even when per-byte entropy looks high. Per-page
      keep-only-when-smaller already bounds the downside to a wasted
      compress attempt.

    Returns ``prefer`` (default "zstd": measured ~80x faster to compress
    and ~20x faster to decompress than zlib-6 on source-code text at
    better ratio, see BENCH.md) or None; the caller feeds it to
    ``EncodeConfig.block_codec``. Falls back to "zlib" if the preferred
    pyarrow compressor is unavailable in the runtime. Deterministic over
    the same (seeded) stats sample."""
    is_txt = F.col("type").isin("str", "bin")
    is_flt = F.col("type").isin("f32", "f64", "arrf32", "arrf64")
    row = (stats.agg(
        (F.sum(F.when(is_txt, F.col("byte_entropy") * F.col("total_bytes")))
         / F.sum(F.when(is_txt, F.col("total_bytes")))).alias("w_entropy"),
        F.sum(F.when(is_flt, F.col("total_bytes"))).alias("float_bytes"),
        F.sum("total_bytes").alias("all_bytes")).collect()[0])
    w = row["w_entropy"]
    txt_slack = w is not None and w <= entropy_max
    flt_slack = (row["all_bytes"] or 0) > 0 and \
        (row["float_bytes"] or 0) / row["all_bytes"] >= float_frac_min
    if not (txt_slack or flt_slack):
        return None
    if prefer != "zlib":
        import pyarrow as pa
        if not pa.Codec.is_available(prefer):
            return "zlib"
    return prefer


def plan_decisions(spark: SparkSession, df: DataFrame, cfg: EncodeConfig,
                   fraction: float = 0.05, seed: int = 42
                   ) -> dict[tuple[int, str], str]:
    """Run the sampling pass and collect the (small) decisions table into
    the dict the encode kernel consumes. Size = num_parts * n_columns."""
    dec = decide_codecs(column_stats(df, cfg, fraction, seed),
                        block_codec=cfg.block_codec)
    return {(r["part_id"], r["column"]): r["codec"] for r in dec.collect()}
