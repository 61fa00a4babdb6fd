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
    table_name: str = "t"


def with_part_id(df: DataFrame, cfg: EncodeConfig) -> DataFrame:
    """Deterministic salted part assignment.

    part_id = pmod(xxhash64(keys..., salt), num_parts) where
    salt = pmod(xxhash64(salt_from...), salt_buckets) splits each hot key
    across up to ``salt_buckets`` parts.
    """
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
    ordered inside (one wide exchange — the encode pass's only shuffle)."""
    order = ["__part_id"] + [k for k in cfg.order_keys if k in df.columns]
    return (df.repartition(cfg.num_parts, "__part_id")
              .sortWithinPartitions(*order))


def plan_num_parts(total_bytes: int, target: int = TARGET_PART_BYTES,
                   min_parts: int = 4) -> int:
    return max(min_parts, int(total_bytes / target) + 1)
