"""Salted partition assignment (BASELINE.json:6 — "salted repartition on
(repo, path-bucket), explicit shuffle-partition sizing").

``part_id`` is a *data-derived, deterministic* column — NOT the physical
Spark partition index — so that resume can recompute identical ids across
runs and cluster sizes (SURVEY.md §3.3). A giant repo (Zipf head) is fanned
out across ``salt_buckets`` part_ids by hashing a secondary column; each
part_id maps to one "row group" of the encoded output.

At 100 TB the knob that matters is bytes-per-part: ``plan_num_parts``
computes the part count from a sampled bytes estimate so each part's
columns fit comfortably in one Python worker (default target 64 MiB)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

TARGET_PART_BYTES = 64 << 20


@dataclass(frozen=True)
class EncodeConfig:
    """How to partition + encode one table."""
    keys: tuple[str, ...] = ("repo",)        # coarse grouping (skew source)
    salt_from: tuple[str, ...] = ("path",)   # secondary cols fanning out hot keys
    salt_buckets: int = 16                   # fan-out per hot key
    num_parts: int = 8                       # total part_ids (row groups)
    order_keys: tuple[str, ...] = ()         # deterministic row order in a part
    page_bytes: int = 1 << 20                # ~1 MiB pages (parquet default-ish)
    page_rows_max: int = 1 << 16
    codec_overrides: dict = field(default_factory=dict)  # col -> codec
    block_codec: str | None = None           # E9 outer page compression
    #                                          ("zlib" | None); default off
    page_crc: bool = False                   # optional page checksum
    #                                          (parquet PageHeader.crc analogue)
    ndv_cols: tuple[str, ...] = ()           # EXTRA columns to HLL-sketch
    #                                          (string/binary columns not in
    #                                          bloom_cols cost one object-
    #                                          hash pass, so they're opt-in)
    ndv_sketch: bool = True                  # per-(part, column) HLL NDV
    #                                          sidecars for int-family
    #                                          columns (bloom-indexed str
    #                                          cols always ride for free);
    #                                          False drops the int hashing
    #                                          pass from the encode kernel
    bloom_cols: tuple[str, ...] = ()         # per-part bloom filters for
    bloom_bits: int = 1 << 17                # equality pruning (parquet
    #                                          BloomFilter analogue); 16 KiB/part/col
    table_name: str = "t"
    # range clustering (zone-map-friendly layout): when set, parts hold
    # CONTIGUOUS ranges of ``range_on`` instead of hash-random key sets,
    # so decode_where's part pruning actually prunes. ``range_bounds``
    # are the precomputed upper-exclusive cut values (plan_range_bounds);
    # storing them in the config (and the RUN.json sidecar) keeps part
    # assignment deterministic across resume attempts — unlike
    # repartitionByRange, whose sampled boundaries drift between runs.
    # salt_from/salt_buckets still fan out a giant range bucket.
    range_on: str | None = None
    range_bounds: tuple = ()
    # z-order clustering (Delta OPTIMIZE ZORDER / Hilbert-lite analogue):
    # when set, each row's part_id comes from the TOP bits of a Morton
    # code interleaving the quantile-ranks of ``zorder_on`` columns, so
    # parts are value-localized in EVERY listed dimension at once and
    # zone maps prune selective predicates on ANY of them (range_on
    # prunes one dimension; hash prunes none). ``zorder_bounds`` holds
    # one plan_range_bounds tuple per column (plan_zorder_bounds) —
    # precomputed and stored so part assignment stays deterministic
    # across resume attempts. num_parts is rounded UP to a power of two
    # (the Morton prefix is a bit string); salt_from is ignored — the
    # quantile ranks are uniform by construction, so parts are already
    # row-balanced. Takes precedence over range_on.
    zorder_on: tuple[str, ...] = ()
    zorder_bounds: tuple = ()
    zorder_bits: int = 8                     # rank width per column
    # shuffle-free ingest mode: part_id = the physical scan split index,
    # so the encode pass has ZERO exchanges (scan -> kernel -> sink).
    # Trades the clustered layout (per-repo dict/FSST locality, range
    # pruning) for raw ingest throughput — the right mode for
    # compaction-style re-encodes and firehose ingest where rows arrive
    # pre-batched. part_id stays reproducible for a FIXED input file set
    # + split size (Spark's split planning is deterministic), which is a
    # weaker resume contract than the data-derived hash: document per
    # job. At 100 TB this removes the single all-data shuffle entirely.
    no_shuffle: bool = False


def plan_range_bounds(df: DataFrame, col: str, num_buckets: int,
                      rel_err: float = 0.001) -> tuple:
    """Quantile cut values for range clustering: ``num_buckets - 1``
    upper-exclusive bounds equalizing rows per bucket (approxQuantile —
    one pass, Greenwald-Khanna, works at any scale). String columns fall
    back to an exact distinct-quantile job over the (small) key domain."""
    dt = dict(df.dtypes)[col]
    if dt in ("tinyint", "smallint", "int", "bigint", "float", "double"):
        q = [i / num_buckets for i in range(1, num_buckets)]
        return tuple(df.stat.approxQuantile(col, q, rel_err))
    # strings: ntile over the DISTINCT key domain (a single-partition
    # window, fine while the domain is << the row count — repos, langs;
    # only num_buckets rows come back to the driver). Guarded: a
    # high-cardinality range_on (e.g. `path`) would funnel the whole
    # domain through one task, so measure it first (approx, one pass)
    # and refuse rather than silently serialize the job.
    max_domain = 1 << 16
    nd = df.agg(F.approx_count_distinct(col).alias("n")).collect()[0]["n"]
    if nd > max_domain:
        raise ValueError(
            f"plan_range_bounds({col!r}): ~{nd} distinct string keys — "
            f"the exact distinct-quantile path is a single-partition "
            f"window, safe only for small domains (<= {max_domain}). "
            "Range-cluster on a lower-cardinality column, or hash the "
            "string to a numeric key first (approxQuantile path).")
    from pyspark.sql.window import Window
    tiles = (df.select(col).distinct()
               .withColumn("__t", F.ntile(num_buckets).over(Window.orderBy(col)))
               .groupBy("__t").agg(F.max(col).alias("b"))
               .orderBy("__t").collect())
    return tuple(r["b"] for r in tiles[:-1])


def plan_zorder_bounds(df: DataFrame, cols: tuple[str, ...],
                       bits: int = 8, rel_err: float = 0.001) -> tuple:
    """Per-column quantile cut values mapping each ``zorder_on`` column
    to a ``bits``-wide rank (2^bits - 1 bounds each) for Morton-code
    interleaving. One approxQuantile pass per column — O(columns)
    metadata-sized driver results, valid at any row count."""
    return tuple(plan_range_bounds(df, c, 1 << bits, rel_err)
                 for c in cols)


def effective_parts(cfg: EncodeConfig) -> int:
    """Total part_ids the config produces (range mode derives it from the
    bounds x salt fan-out; hash mode is num_parts verbatim)."""
    if cfg.zorder_on and cfg.zorder_bounds:
        p = 1
        while p < cfg.num_parts:
            p <<= 1
        return p
    if cfg.range_on and cfg.range_bounds:
        salt = cfg.salt_buckets if cfg.salt_from else 1
        return (len(cfg.range_bounds) + 1) * salt
    return cfg.num_parts


def with_part_id(df: DataFrame, cfg: EncodeConfig) -> DataFrame:
    """Deterministic salted part assignment.

    Hash mode (default):
    part_id = pmod(xxhash64(keys..., salt), num_parts) where
    salt = pmod(xxhash64(salt_from...), salt_buckets) splits each hot key
    across up to ``salt_buckets`` parts.

    Range mode (``range_on`` + ``range_bounds`` set): part_id =
    range_bucket * salt_buckets + salt, where range_bucket counts the
    precomputed upper-inclusive bounds below the row's value — parts
    hold contiguous value ranges, so decode_where's zone-map pruning
    skips whole parts (hash layout spreads every range over every part
    and prunes nothing). The bucket search is O(len(bounds)) per row in
    codegen — fine to a few thousand buckets; cluster on a
    moderate-cardinality prefix (repo, date), not a unique key. NULLs
    land in bucket 0 (they sort first, matching Spark's NULLS FIRST).
    """
    if cfg.no_shuffle:
        return df.withColumn("__part_id", F.spark_partition_id())
    if (cfg.zorder_on and cfg.zorder_bounds
            and all(c in df.columns for c in cfg.zorder_on)):
        # Morton interleave of per-column quantile ranks; part_id = the
        # top log2(num_parts) bits. Pure codegen: the rank is the same
        # bounds-counting fold as range mode, the interleave is a flat
        # sum of bits*k shift/mask terms (k*bits <= 64). NULL ranks 0
        # (NULLS FIRST, matching range mode).
        k = len(cfg.zorder_on)
        bits = cfg.zorder_bits
        if k * bits > 63:
            raise ValueError(
                f"zorder: {k} cols x {bits} bits exceeds the 63-bit "
                "Morton budget — lower zorder_bits")
        ranks = []
        for name, bs in zip(cfg.zorder_on, cfg.zorder_bounds):
            c = F.col(name)
            barr = F.array(*[F.lit(b) for b in bs])
            r = F.aggregate(
                barr, F.lit(0),
                lambda acc, b: acc + F.when(c > b, F.lit(1))
                                      .otherwise(F.lit(0)))
            ranks.append(F.when(c.isNull(), F.lit(0)).otherwise(r)
                          .cast("long"))
        z = F.lit(0).cast("long")
        for i in range(bits):
            for j in range(k):
                bit = F.shiftright(ranks[j], i).bitwiseAND(F.lit(1))
                z = z + F.shiftleft(bit, i * k + (k - 1 - j))
        nparts = effective_parts(cfg)
        p = nparts.bit_length() - 1
        part = F.shiftright(z, k * bits - p) if p < k * bits else z
        return df.withColumn("__part_id", part.cast("int"))
    if cfg.range_on and cfg.range_bounds and cfg.range_on in df.columns:
        c = F.col(cfg.range_on)
        barr = F.array(*[F.lit(b) for b in cfg.range_bounds])
        ridx = F.aggregate(
            barr, F.lit(0),
            lambda acc, b: acc + F.when(c > b, F.lit(1)).otherwise(F.lit(0)))
        ridx = F.when(c.isNull(), F.lit(0)).otherwise(ridx)
        if cfg.salt_from:
            salt_cols = [F.col(s) for s in cfg.salt_from if s in df.columns]
            salt = (F.pmod(F.xxhash64(*salt_cols), F.lit(cfg.salt_buckets))
                    if salt_cols else F.lit(0))
            part = ridx * cfg.salt_buckets + salt
        else:
            part = ridx
        return df.withColumn("__part_id", part.cast("int"))
    key_cols = [F.col(k) for k in cfg.keys if k in df.columns]
    salt_cols = [F.col(c) for c in cfg.salt_from if c in df.columns]
    if not key_cols and not salt_cols:
        # none of the configured columns exist on this table: spread by a
        # hash of the whole row rather than collapsing into one part
        key_cols = [F.col(c) for c in df.columns]
    if salt_cols:
        salt = F.pmod(F.xxhash64(*salt_cols), F.lit(cfg.salt_buckets))
    else:
        salt = F.lit(0)
    if not key_cols:
        key_cols = [F.lit(0)]
    part = F.pmod(F.xxhash64(*key_cols, salt), F.lit(cfg.num_parts))
    return df.withColumn("__part_id", part.cast("int"))


def cluster_by_part(df: DataFrame, cfg: EncodeConfig) -> DataFrame:
    """Shuffle so each part_id is contiguous in one task, deterministically
    ordered inside (one wide exchange — the encode pass's only shuffle).
    ``no_shuffle`` skips the exchange: scan splits are already contiguous
    part_ids; rows are optionally sorted inside each split."""
    if cfg.no_shuffle:
        order = [k for k in cfg.order_keys if k in df.columns]
        return df.sortWithinPartitions(*order) if order else df
    order = ["__part_id"] + [k for k in cfg.order_keys if k in df.columns]
    return (df.repartition(effective_parts(cfg), "__part_id")
              .sortWithinPartitions(*order))


def plan_num_parts(total_bytes: int, target: int = TARGET_PART_BYTES,
                   min_parts: int = 4) -> int:
    return max(min_parts, int(total_bytes / target) + 1)
