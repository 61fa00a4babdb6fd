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
single-level `array<T>` (Dremel rep/def levels). Unsupported types
fail loudly up front with the column names.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from . import interop


def _check_schema(schema: pa.Schema) -> None:
    bad: list[str] = []
    for f in schema:
        t = f.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            t = t.value_type
            if pa.types.is_nested(t) or t == pa.bool_():
                bad.append(f"{f.name}: {f.type}")
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
                   statistics: bool = True) -> DataFrame:
    """Write ``df`` as a directory of standard .parquet files (one per
    partition, written executor-side by OUR writer) and return the
    per-file manifest DataFrame ``(file, rows, bytes)``. The manifest
    is lazy — force it (collect/count) to run the export."""
    spark_schema = df.schema
    os.makedirs(dst, exist_ok=True)
    dict_cols = frozenset(dictionary)
    opts = dict(compression=compression, page_rows=page_rows,
                row_group_rows=row_group_rows, page_index=page_index,
                statistics=statistics)

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
    return df.mapInArrow(write_part, "file string, rows long, bytes long")


def _arrow_type(dt) -> pa.DataType:
    """Spark type -> the Arrow type mapInArrow will hand the worker
    (mirror of Spark's toArrowType for the subset we accept)."""
    from pyspark.sql import types as T
    m = {T.BooleanType: pa.bool_(), T.ByteType: pa.int8(),
         T.ShortType: pa.int16(), T.IntegerType: pa.int32(),
         T.LongType: pa.int64(), T.FloatType: pa.float32(),
         T.DoubleType: pa.float64(), T.StringType: pa.string(),
         T.DateType: pa.date32()}
    for k, v in m.items():
        if isinstance(dt, k):
            return v
    from pyspark.sql.types import ArrayType, DecimalType
    if isinstance(dt, DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    return pa.struct([])          # unsupported: _check_schema rejects
