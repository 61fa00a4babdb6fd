"""Temporal joins the DataFrame API lacks, expressed shuffle-minimally.

``asof_join`` is the classic time-series primitive (pandas.merge_asof /
kdb aj / DuckDB ASOF JOIN): for every left row, the single most recent
right row at-or-before its timestamp (or at-or-after, ``direction=
'forward'``), per key. The naive SQL shape is an inequality join whose
candidate set explodes quadratically per key; the implementation here is
the union-sort formulation instead — tag both sides, union, ONE window
sort per (key) partition, last-non-null carry-forward — so the cost is
one shuffle of L+R rows and a linear scan, never an all-pairs expansion.
That is the shape that survives 100 TB: no range cross product, skew
bounded by the hottest key's row count, and Catalyst keeps the sort
inside a single Exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_L = "__cps_is_left"
_R = "__cps_asof"


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: tuple[str, ...] | list[str] = (),
              value_cols: tuple[str, ...] | list[str] | None = None,
              tolerance: float | None = None,
              direction: str = "backward",
              prefix: str = "r_") -> DataFrame:
    """LEFT as-of join: every ``left`` row, plus ``prefix+on`` and
    ``prefix+c`` for each right ``value_cols`` column taken from the
    nearest ``right`` row per ``by`` key with ``right.on <= left.on``
    (``'backward'``; ``'forward'`` flips the inequality). No match →
    NULLs, like merge_asof.

    ``tolerance``: maximum |left.on - right.on| accepted, in the
    column's numeric units (seconds for timestamps); farther matches
    become NULL rather than falling back to an older row (merge_asof
    semantics).

    Ties: several right rows sharing one (by, on) slot are resolved
    arbitrarily — pre-aggregate the right side (e.g. arg-max on a
    unique id) when determinism matters; the right payload travels as
    ONE struct so a NULL inside a matched row never falls back to an
    earlier row (a per-column last(ignorenulls) would).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got "
                         f"{direction!r}")
    by = list(by)
    if not by:
        # Window.partitionBy() of nothing funnels EVERY row through one
        # task — correct output, zero parallelism, and at scale one
        # executor sorting the whole union. Refuse rather than silently
        # serialize; a global as-of (no key) should pre-bucket the time
        # axis into coarse ranges and pass that bucket as `by`.
        raise ValueError(
            "asof_join with empty `by` would run as a single-partition "
            "window (the whole union sorted on one task). Pass at least "
            "one key column, or bucket the time axis first and pass the "
            "bucket column as `by`.")
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c != on and c not in by]
    value_cols = list(value_cols)
    clash = [prefix + c for c in [on] + value_cols
             if prefix + c in left.columns]
    if clash:
        raise ValueError(f"asof_join output columns {clash} collide with "
                         f"left columns; pass a different prefix")
    lt = left.withColumn(_L, F.lit(1)).withColumn(
        _R, F.lit(None).cast(
            right.select(F.struct(F.col(on).alias("on"),
                                  *value_cols)).schema[0].dataType))
    rt = right.select(
        *by, F.col(on),
        F.lit(0).alias(_L),
        F.struct(F.col(on).alias("on"), *value_cols).alias(_R))
    both = lt.unionByName(rt, allowMissingColumns=True)
    order = [F.col(on).asc(), F.col(_L).asc()] if direction == "backward" \
        else [F.col(on).desc(), F.col(_L).asc()]
    w = (Window.partitionBy(*by).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    both = both.withColumn(_R, F.last(_R, ignorenulls=True).over(w))
    out = both.filter(F.col(_L) == 1).drop(_L)
    match: Column = F.col(_R).isNotNull()
    if tolerance is not None:
        delta = F.col(on).cast("double") - F.col(_R)["on"].cast("double")
        if direction == "forward":
            delta = -delta
        match = match & (delta <= F.lit(float(tolerance)))
    cols = [F.when(match, F.col(_R)["on"]).alias(prefix + on)] + \
           [F.when(match, F.col(_R)[c]).alias(prefix + c)
            for c in value_cols]
    return out.select(*left.columns, *cols)
