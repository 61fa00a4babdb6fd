"""Distributed standard-parquet sink built on the interop writer.

`export_parquet` writes a DataFrame as a directory of REAL .parquet
files — one per partition, written INSIDE the executors by
`interop.write_parquet` (our page emitters, our Thrift writer) — that
any parquet reader consumes: pyarrow, DuckDB, and Spark's own JVM
parquet-java reader (the strongest cross-implementation check we can
run in-sandbox; `tests/test_export.py` pins all three). Each file
carries the format's pruning sidecars from our emitters: per-row-group
ColumnMetaData Statistics and the ColumnIndex/OffsetIndex PageIndex.

Scale shape: the plan is one `mapInArrow` pass — no shuffle, no
collect; each task streams its Arrow batches straight into one file
and emits a one-row manifest (file, rows, bytes). Partitioning is
whatever the caller arranged upstream (repartition by key for
co-location, or the engine's salted layout); at 1000 executors this is
1000 concurrent file writers, exactly how a real distributed sink
behaves. Writes land as `part-<pid>-<uuid>.parquet` so concurrent or
retried attempts never collide (speculative-execution-safe: a retried
task writes a new file, and the returned manifest names the winners).

Supported column types: everything `interop.write_parquet` takes —
flat bool/int8/16/32/64/date/float/double/decimal(p<=18)/string plus
single-level `array<T>`, `struct<leaves>`, `map<k,v>` and
`array<struct<leaves>>` (Dremel rep/def levels, def domain 0-4 for the
list-of-group shape). Unsupported types fail loudly up front with the
column names.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from . import interop


def _leaf_ok(t: pa.DataType) -> bool:
    """Can `interop.write_parquet` store this type as a NESTED leaf?
    Runs the real `_colspec` so the driver-side pre-check rejects
    exactly what an executor would reject (e.g. struct<interval> must
    fail HERE, not mid-job). Bool leaves are legal everywhere since
    round 5 (PLAIN bit-packed under the level framing)."""
    if pa.types.is_nested(t):
        return False
    try:
        interop._colspec(t)
    except Exception:
        return False
    return True


def _check_schema(schema: pa.Schema) -> None:
    bad: list[str] = []
    for f in schema:
        t = f.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            et = t.value_type
            if pa.types.is_struct(et):       # list<struct<leaves>>
                for i in range(et.num_fields):
                    if not _leaf_ok(et.field(i).type):
                        bad.append(f"{f.name}[].{et.field(i).name}: "
                                   f"{et.field(i).type}")
            elif not _leaf_ok(et):
                bad.append(f"{f.name}: {f.type}")
            continue
        if pa.types.is_struct(t):
            for i in range(t.num_fields):
                if not _leaf_ok(t.field(i).type):
                    bad.append(f"{f.name}.{t.field(i).name}: "
                               f"{t.field(i).type}")
            continue
        if pa.types.is_map(t):
            if not (_leaf_ok(t.key_type) and _leaf_ok(t.item_type)):
                bad.append(f"{f.name}: {t}")
            continue
        try:
            interop._colspec(t)
        except Exception:
            bad.append(f"{f.name}: {t}")
            continue
        if pa.types.is_nested(t):
            bad.append(f"{f.name}: {t}")
    if bad:
        raise ValueError(
            "export_parquet: unsupported column types (drop or cast "
            "them first): " + ", ".join(bad))


def export_parquet(df: DataFrame, dst: str, *,
                   dictionary: set[str] | frozenset[str] = frozenset(),
                   compression: str | None = "zstd",
                   page_rows: int | None = 20_000,
                   row_group_rows: int | None = 200_000,
                   page_index: bool = True,
                   statistics: bool = True,
                   string_encoding: str = "delta_length",
                   bloom: set[str] | frozenset[str] = frozenset(),
                   bloom_fpp: float = 0.01) -> DataFrame:
    """Write ``df`` as a directory of standard .parquet files (one per
    partition, written executor-side by OUR writer) and return the
    per-file manifest DataFrame ``(file, rows, bytes)``. The manifest
    is lazy — force it (collect/count) to run the export.

    ``bloom`` names flat columns that get the format's SBBF BloomFilter
    sidecar per row group (parquet.thrift BloomFilterHeader, XXHASH /
    BLOCK, ColumnMetaData fields 14/15) — point predicates on high-
    cardinality columns then skip row groups min/max stats cannot
    (`scan_parquet(eq_prune=...)`; parquet-java consumes them too)."""
    spark_schema = df.schema
    os.makedirs(dst, exist_ok=True)
    dict_cols = frozenset(dictionary)
    opts = dict(compression=compression, page_rows=page_rows,
                row_group_rows=row_group_rows, page_index=page_index,
                statistics=statistics, string_encoding=string_encoding,
                bloom=frozenset(bloom), bloom_fpp=bloom_fpp)

    def write_part(batches: Iterator[pa.RecordBatch]
                   ) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        got = list(batches)
        out_schema = pa.schema([("file", pa.string()),
                                ("rows", pa.int64()),
                                ("bytes", pa.int64())])
        if not got:
            yield pa.RecordBatch.from_pylist([], schema=out_schema)
            return
        tbl = pa.Table.from_batches(got)
        _check_schema(tbl.schema)
        fname = f"part-{pid:05d}-{uuid.uuid4().hex[:12]}.parquet"
        path = os.path.join(dst, fname)
        cols = {name: tbl.column(name).combine_chunks()
                for name in tbl.column_names}
        interop.write_parquet(path, cols, dictionary=dict_cols, **opts)
        yield pa.RecordBatch.from_pylist(
            [{"file": fname, "rows": len(tbl),
              "bytes": os.path.getsize(path)}], schema=out_schema)

    # fail loudly on the driver before launching tasks (cheap: schema only)
    _check_schema(pa.schema([
        pa.field(f.name, _arrow_type(f.dataType)) for f in spark_schema]))
    names = {f.name: f for f in spark_schema.fields}
    for b in bloom:
        if b not in names:
            raise ValueError(f"bloom column {b!r} not in the DataFrame")
        at = _arrow_type(names[b].dataType)
        if pa.types.is_nested(at) or at == pa.bool_():
            raise ValueError(f"bloom filters are flat-leaf only: "
                             f"{b}: {names[b].dataType.simpleString()}")
    return df.mapInArrow(write_part, "file string, rows long, bytes long")


def _arrow_type(dt) -> pa.DataType:
    """Spark type -> the Arrow type mapInArrow will hand the worker
    (mirror of Spark's toArrowType for the subset we accept)."""
    from pyspark.sql import types as T
    m = {T.BooleanType: pa.bool_(), T.ByteType: pa.int8(),
         T.ShortType: pa.int16(), T.IntegerType: pa.int32(),
         T.LongType: pa.int64(), T.FloatType: pa.float32(),
         T.DoubleType: pa.float64(), T.StringType: pa.string(),
         T.DateType: pa.date32(),
         T.TimestampType: pa.timestamp("us", tz="UTC"),
         T.TimestampNTZType: pa.timestamp("us")}
    for k, v in m.items():
        if isinstance(dt, k):
            return v
    from pyspark.sql.types import ArrayType, DecimalType, StructType
    if isinstance(dt, DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    if isinstance(dt, StructType):
        return pa.struct([pa.field(f.name, _arrow_type(f.dataType))
                          for f in dt.fields])
    from pyspark.sql.types import MapType
    if isinstance(dt, MapType):
        return pa.map_(_arrow_type(dt.keyType), _arrow_type(dt.valueType))
    return pa.dictionary(pa.int8(), pa.int8())  # _check_schema rejects


def _rg_stats(path: str) -> list[dict]:
    """Metadata-only per-ROW-GROUP {column: (min, max)} from the
    Statistics structs (columns without stats absent). Reads only the
    footer — never a page."""
    buf = interop._map_file(path)
    import numpy as np
    flen = int(np.frombuffer(buf[-8:-4], np.uint32)[0])
    meta = interop._CR(buf, len(buf) - 8 - flen).struct()
    # dotted-path keyed: a nested leaf sharing a flat column's bare
    # name must not shadow the flat column's physical type
    ptypes = {p: el[1] for p, el in interop._walk_leaves(meta[2]).items()}
    out: list[dict] = []
    for rg in meta[4]:
        ent: dict = {}
        for chunk in rg[1]:
            cm = chunk[3]
            if len(cm[3]) != 1:
                continue
            name = cm[3][0].decode()
            st = cm.get(12)
            if st is None or 5 not in st or 6 not in st:
                continue
            ent[name] = (interop._plain_scalar(st[6], ptypes[name]),
                         interop._plain_scalar(st[5], ptypes[name]))
        out.append(ent)
    return out


def _spark_type_of(t: pa.DataType) -> str:
    """Arrow type -> Spark DDL type string (for mapInArrow schemas)."""
    m = {pa.bool_(): "boolean", pa.int8(): "tinyint",
         pa.int16(): "smallint", pa.int32(): "int", pa.int64(): "bigint",
         pa.float32(): "float", pa.float64(): "double",
         pa.date32(): "date"}
    if t in m:
        return m[t]
    if pa.types.is_timestamp(t):
        return "timestamp" if t.tz is not None else "timestamp_ntz"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_spark_type_of(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(
            f"`{t.field(i).name}`: {_spark_type_of(t.field(i).type)}"
            for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return (f"map<{_spark_type_of(t.key_type)}, "
                f"{_spark_type_of(t.item_type)}>")
    return "string"


#: file count above which scan planning fans out to the executors
#: (Spark's parallelPartitionDiscovery.threshold analogue). A driver
#: footer read is one mmap + compact-thrift parse (~0.3 ms), so 1024
#:  files plan in ~0.3 s driver-side — well under the ~1 s a
#: Python-worker metadata job costs on this box; a 10^5-file directory
#: crosses over decisively and fans out
PARALLEL_PLAN_THRESHOLD = 1024


def plan_row_groups(files: list[str], ranges=(), eqs=(), spark=None,
                    ins=()) -> list[tuple[str, int]]:
    """Metadata-only scan planning shared by `scan_parquet` and the
    Python DataSource front door: -> sorted surviving ``(path, rgi)``
    pairs (rgi -1 = a file without per-row-group stats, scanned whole).

    ``ranges``: (column, lo, hi) windows (lo/hi None = open side) pruned
    via footer Statistics; ``eqs``: (column, value) point predicates
    pruned via Statistics AND the SBBF bloom sidecar when present;
    ``ins``: (column, values) IN-lists — a row group survives when ANY
    value passes its stats window and bloom (OR within the list, AND
    across predicates). Pruning is conservative (a surviving row group
    may still hold no matching row — the caller applies the exact
    predicate). At or below `PARALLEL_PLAN_THRESHOLD` files (or with no
    ``spark`` session) footers are read on the driver; above it one
    metadata task per file-batch reads them executor-side and ships
    back only survivors — one (string, int) row each."""
    import decimal as _decimal

    def _enc(v):
        if isinstance(v, _decimal.Decimal):
            # decimal columns store UNSCALED ints in Statistics and
            # bloom hashes (write side: _pq_work/dec_unscaled); a raw
            # Decimal here would compare/hash in the wrong domain and
            # prune row groups that DO hold the value. Pruning must
            # never lie — refuse loudly, callers pass the unscaled int
            raise ValueError(
                "plan_row_groups: Decimal predicate values are not "
                "supported — pass the column's UNSCALED integer "
                "(value * 10**scale) instead")
        return v.encode() if isinstance(v, str) else v

    ranges_n = [(col, _enc(lo), _enc(hi)) for col, lo, hi in ranges]
    eqs_n = [(col, _enc(v), v) for col, v in eqs]
    ins_n = [(col, tuple((_enc(v), v) for v in vals))
             for col, vals in ins]

    # one bloom probe per (file, column) with ALL that column's values
    # hashed in one batch — planning cost stays one footer parse per
    # predicate column, not one per VALUE (64-value IN-lists would
    # otherwise re-mmap the footer 64 times per file)
    probe_vals: dict[str, list] = {}

    def _slot(col, raw) -> int:
        vs = probe_vals.setdefault(col, [])
        vs.append(raw)
        return len(vs) - 1

    eq_slots = [(col, sv, _slot(col, raw)) for col, sv, raw in eqs_n]
    in_slots = [(col, [(sv, _slot(col, raw)) for sv, raw in vals])
                for col, vals in ins_n]

    def plan_file(p: str) -> list[tuple[str, int]]:
        stats = _rg_stats(p)
        blooms = {col: interop.bloom_rg_multi(p, col, vs)
                  for col, vs in probe_vals.items()}

        def point_alive(rgi, ent, col, sv, slot) -> bool:
            st = ent.get(col)
            if st is not None and not (st[0] <= sv <= st[1]):
                return False
            bl = blooms.get(col)
            if bl is not None:
                bits = bl.get(rgi)
                if bits is not None and not bits[slot]:
                    return False               # bloom: provably absent
            return True

        def rg_survives(rgi, ent) -> bool:
            for col, lo, hi in ranges_n:
                st = ent.get(col)
                if st is None:
                    continue
                if lo is not None and st[1] < lo:
                    return False
                if hi is not None and st[0] > hi:
                    return False
            for col, sv, slot in eq_slots:
                if not point_alive(rgi, ent, col, sv, slot):
                    return False
            for col, vals in in_slots:
                if not any(point_alive(rgi, ent, col, sv, slot)
                           for sv, slot in vals):
                    return False
            return True

        if not stats:
            return [(p, -1)]
        return [(p, rgi) for rgi, ent in enumerate(stats)
                if rg_survives(rgi, ent)]

    if spark is None or len(files) <= PARALLEL_PLAN_THRESHOLD:
        return sorted(pair for f in files for pair in plan_file(f))

    def footer_pass(batches: Iterator[pa.RecordBatch]
                    ) -> Iterator[pa.RecordBatch]:
        meta_schema = pa.schema([("path", pa.string()),
                                 ("rgi", pa.int32())])
        for batch in batches:
            for p in batch.column("path").to_pylist():
                keep = [{"path": pp, "rgi": rgi}
                        for pp, rgi in plan_file(p)]
                if keep:
                    yield pa.RecordBatch.from_pylist(keep,
                                                     schema=meta_schema)

    fdf0 = spark.createDataFrame([(f,) for f in files], "path string")
    fdf0 = fdf0.repartition(min(len(files), 64))
    return sorted((r["path"], r["rgi"]) for r in
                  fdf0.mapInArrow(footer_pass,
                                  "path string, rgi int").collect())


def scan_parquet(spark, src: str, columns: list[str] | None = None,
                 range_prune: tuple | None = None,
                 apply_range: bool = False,
                 eq_prune: tuple | None = None) -> DataFrame:
    """Distributed scan of a directory of standard .parquet files
    through OUR reader (`interop.read_parquet_with_our_codecs`): file
    list on the driver (metadata-sized), one decode task per file via
    `mapInArrow` — the import twin of `export_parquet`.

    ``columns`` projects: unrequested column chunks are never decoded.
    ``range_prune=(column, lo, hi)`` drops ROW GROUPS whose footer
    Statistics window cannot intersect ``[lo, hi]`` — metadata-only, no
    page bytes touched (page-granular pruning for a single column lives
    in `interop.read_column_pruned`). Scan planning is distributed
    above `PARALLEL_PLAN_THRESHOLD` files: a first metadata job reads
    each file's footer inside the executors and ships back only the
    surviving (file, row-group) pairs, so a 10^5-file directory plans
    in parallel instead of a driver-side footer loop (small
    directories plan on the driver — a few mmaps beat a Spark job);
    schema derivation always reads exactly ONE footer
    (`interop.footer_schema` — SchemaElements only, no page decode). By default the predicate itself is NOT applied to
    surviving rows — chain ``.filter`` for exact semantics, as with any
    min-max zone pruning; ``apply_range=True`` additionally applies the
    exact ``[lo, hi]`` filter INSIDE the scan task (one Arrow compute
    pass) so non-matching rows never cross the Python->JVM boundary —
    the right shape for selective scans at scale. Requires the pruned
    column in the projection.

    ``eq_prune=(column, value)`` point-prunes: a row group is dropped
    when its Statistics window excludes the value OR its BloomFilter
    sidecar proves the value absent — the bloom catches what min/max
    can't (high-cardinality scattered keys), turning a needle lookup
    over many files into a handful of decode tasks. Row groups without
    a bloom fall back to stats-only. Exact semantics still need a
    chained ``.filter`` (bloom false positives scan but never lie)."""
    import glob as _glob
    all_files = sorted(_glob.glob(os.path.join(src, "*.parquet")))
    if not all_files:
        raise ValueError(f"no .parquet files under {src!r}")
    ranges = []
    if range_prune is not None:
        ranges.append(range_prune)
    eqs = []
    if eq_prune is not None:
        eqs.append(eq_prune)
    # schema from ONE footer (SchemaElements only) — pruning every row
    # group still yields a correctly-typed EMPTY DataFrame
    ftypes = interop.footer_schema(all_files[0])
    if columns is not None:
        ftypes = {n: t for n, t in ftypes.items() if n in columns}
    if not ftypes:
        raise ValueError(f"projection {columns!r} matches no column")
    schema_str = ", ".join(f"`{n}` {_spark_type_of(t)}"
                           for n, t in ftypes.items())
    surv = plan_row_groups(all_files, ranges, eqs, spark=spark)
    # work list: one item per surviving ROW GROUP (the scan's
    # parallelism unit — a single huge externally-written file still
    # fans out across executors)
    items = [(p, "" if rgi < 0 else str(rgi)) for p, rgi in surv]
    fdf = spark.createDataFrame(items or [], "path string, rgs string")
    fdf = fdf.repartition(max(len(items), 1))

    if apply_range:
        if range_prune is None:
            raise ValueError("apply_range needs range_prune")
        if columns is not None and range_prune[0] not in columns:
            raise ValueError("apply_range needs the pruned column in "
                             "the projection")

    # column ORDER is part of the mapInArrow contract: the declared
    # schema is in FOOTER order, but the reader's output dict appends
    # struct/map reassemblies after the flat columns — emit batches in
    # the declared order explicitly (a struct column anywhere but last
    # would otherwise mis-bind)
    out_names = list(ftypes)

    def scan(batches):
        import pyarrow.compute as pc
        for batch in batches:
            for p, rgs in zip(batch.column("path").to_pylist(),
                              batch.column("rgs").to_pylist()):
                rg_list = [int(x) for x in rgs.split(",")] if rgs else None
                cols = interop.read_parquet_with_our_codecs(
                    p, columns, row_groups=rg_list)
                tbl = pa.table(
                    {n: cols[n].cast(_norm_type(cols[n].type))
                     for n in out_names})
                if apply_range:
                    cl = tbl.column(range_prune[0])
                    lo_v, hi_v = range_prune[1], range_prune[2]
                    if pa.types.is_string(cl.type):
                        lo_v = lo_v.decode() if isinstance(lo_v, bytes) \
                            else lo_v
                        hi_v = hi_v.decode() if isinstance(hi_v, bytes) \
                            else hi_v
                    tbl = tbl.filter(pc.and_(pc.greater_equal(cl, lo_v),
                                             pc.less_equal(cl, hi_v)))
                yield from tbl.to_batches()

    return fdf.mapInArrow(scan, schema_str)


def _norm_type(t: pa.DataType) -> pa.DataType:
    """Arrow type -> the small-offset form Spark's mapInArrow schema
    declares (large_string/large_list don't match array<string> etc.)."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.list_(_norm_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct([pa.field(t.field(i).name,
                                   _norm_type(t.field(i).type))
                          for i in range(t.num_fields)])
    if pa.types.is_map(t):
        return pa.map_(_norm_type(t.key_type), _norm_type(t.item_type))
    return t
