"""Spark Python DataSource front door (Spark 4 `pyspark.sql.datasource`).

Registers the engine's standard-parquet surface as a first-class Spark
format, so the idiomatic read/write API works end to end over files
produced by OUR emitters and decoded by OUR kernels::

    from cpp_parquet_spark.datasource import CppParquetDataSource
    spark.dataSource.register(CppParquetDataSource)

    df.write.format("cpp_parquet").option("bloom", "k").save(dst)
    spark.read.format("cpp_parquet").load(dst).filter("k = 7").show()

Read side: schema discovery is one footer (`interop.footer_schema`, no
page decode); `pushFilters` captures =, <, <=, >, >= and IN predicates
on top-level columns and feeds them to the shared metadata planner
(`export.plan_row_groups` — Statistics windows + SBBF bloom point
checks), so Catalyst's pushed filters become ROW-GROUP pruning before a
single data task launches. Every filter is also returned to Spark, which
re-applies the exact predicate — pruning is conservative, results are
exact. One `InputPartition` per surviving row group; `read` yields Arrow
RecordBatches straight from `interop.read_parquet_with_our_codecs` with
column projection (only requested chunks decode).

Write side: `DataSourceArrowWriter` — each task streams its Arrow
batches into one `part-<uuid>.parquet` via `interop.write_parquet`
(dictionary / compression / page_rows / row_group_rows / bloom options
pass through), names collide-free under speculative retries, and
`commit` keeps only the files named by successful tasks' commit
messages (an aborted attempt's file is removed on the driver).

Options (all strings, as Spark options are): ``path`` (or pass to
load/save), ``columns`` (comma list, read-side projection),
``compression`` (default zstd), ``page_rows``, ``row_group_rows``,
``dictionary`` (comma list), ``bloom`` (comma list), ``bloom_fpp``,
``string_encoding``.
"""

from __future__ import annotations

import glob
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

FORMAT_NAME = "cpp_parquet"

#: literal types the metadata planner can compare against Statistics
#: min/max (and hash into blooms) — anything else is left to Spark
_PRUNABLE = (int, float, str)


def _files_of(options) -> list[str]:
    src = options.get("path")
    if not src:
        raise ValueError(f"{FORMAT_NAME}: a path is required "
                         "(load(path) or option('path', ...))")
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    if not files:
        raise ValueError(f"{FORMAT_NAME}: no .parquet files under "
                         f"{src!r}")
    return files


@dataclass(frozen=True)
class RowGroupPartition(InputPartition):
    path: str
    rgi: int                       # -1 = whole file (no per-rg stats)


def _read_rg(path: str, rgi: int, columns: list[str]
             ) -> Iterator[pa.RecordBatch]:
    """Decode one row group (or whole file, rgi -1) through our
    kernels, projected and normalized to the declared Spark schema."""
    from . import interop
    from .export import _norm_type
    cols = interop.read_parquet_with_our_codecs(
        path, columns, row_groups=[rgi] if rgi >= 0 else None)
    tbl = pa.table({n: cols[n].cast(_norm_type(cols[n].type))
                    for n in columns})
    yield from tbl.to_batches()


class CppParquetReader(DataSourceReader):
    def __init__(self, options, schema):
        self._options = options
        self._files = _files_of(options)
        self._columns = [f.name for f in schema.fields]
        self._ranges: dict[str, list] = {}
        self._eqs: list[tuple[str, object]] = []
        self._ins: list[tuple[str, tuple]] = []

    def pushFilters(self, filters):
        """Capture prunable predicates for row-group planning; EVERY
        filter is yielded back so Spark applies exact semantics on the
        decoded rows (stats/bloom pruning never lies, only over-keeps).
        """
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 \
                    and isinstance(f.value, _PRUNABLE) \
                    and not isinstance(f.value, bool):
                self._eqs.append((f.attribute[0], f.value))
            elif isinstance(f, In) and len(f.attribute) == 1 \
                    and f.value \
                    and all(isinstance(v, _PRUNABLE)
                            and not isinstance(v, bool)
                            for v in f.value):
                col = f.attribute[0]
                if len(f.value) <= 64:
                    # per-value stats + bloom membership, OR'd — a row
                    # group survives only if SOME value might be there
                    self._ins.append((col, tuple(f.value)))
                else:
                    # big IN lists prune as a [min, max] window only
                    w = self._ranges.setdefault(col, [None, None])
                    lo, hi = min(f.value), max(f.value)
                    w[0] = lo if w[0] is None else max(w[0], lo)
                    w[1] = hi if w[1] is None else min(w[1], hi)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) \
                    and len(f.attribute) == 1 \
                    and isinstance(f.value, _PRUNABLE) \
                    and not isinstance(f.value, bool):
                w = self._ranges.setdefault(f.attribute[0],
                                            [None, None])
                w[0] = f.value if w[0] is None else max(w[0], f.value)
            elif isinstance(f, (LessThan, LessThanOrEqual)) \
                    and len(f.attribute) == 1 \
                    and isinstance(f.value, _PRUNABLE) \
                    and not isinstance(f.value, bool):
                w = self._ranges.setdefault(f.attribute[0],
                                            [None, None])
                w[1] = f.value if w[1] is None else min(w[1], f.value)
            yield f                # Spark re-applies the exact filter

    def partitions(self):
        from .export import plan_row_groups
        ranges = [(col, w[0], w[1]) for col, w in self._ranges.items()]
        surv = plan_row_groups(self._files, ranges, self._eqs,
                               ins=self._ins)
        return [RowGroupPartition(p, rgi) for p, rgi in surv]

    def read(self, part: "RowGroupPartition | None"
             ) -> Iterator[pa.RecordBatch]:
        if part is None:       # every row group pruned: one empty task
            return
        yield from _read_rg(part.path, part.rgi, self._columns)


@dataclass
class _FileCommit(WriterCommitMessage):
    file: str
    rows: int


def _write_file(options, path: str,
                batches: Iterator[pa.RecordBatch]) -> int:
    """Collect one task's Arrow batches into one parquet file through
    `interop.write_parquet` with the format's write options — the ONE
    place batch and streaming writers share their option plumbing.
    Returns the row count (0 = empty partition, no file written)."""
    from . import interop
    from .export import _check_schema
    got = list(batches)
    if not got:
        return 0
    tbl = pa.Table.from_batches(got)
    _check_schema(tbl.schema)

    def csv_set(k: str):
        return frozenset(x for x in options.get(k, "").split(",") if x)

    interop.write_parquet(
        path,
        {n: tbl.column(n).combine_chunks() for n in tbl.column_names},
        dictionary=csv_set("dictionary"),
        compression=options.get("compression", "zstd"),
        page_rows=int(options.get("page_rows", 20_000)),
        row_group_rows=int(options.get("row_group_rows", 200_000)),
        page_index=True, statistics=True,
        string_encoding=options.get("string_encoding", "delta_length"),
        bloom=csv_set("bloom"),
        bloom_fpp=float(options.get("bloom_fpp", 0.01)))
    return len(tbl)


class CppParquetWriter(DataSourceArrowWriter):
    def __init__(self, options, schema, overwrite: bool):
        self._options = options
        self._dst = options.get("path")
        if not self._dst:
            raise ValueError(f"{FORMAT_NAME}: a path is required")
        if overwrite:
            for f in glob.glob(os.path.join(self._dst, "*.parquet")):
                os.remove(f)
            log = os.path.join(self._dst, "_commits.jsonl")
            if os.path.exists(log):
                os.remove(log)
        os.makedirs(self._dst, exist_ok=True)
        # per-JOB token: commit/abort may only reclaim THIS job's
        # orphaned attempt files — append jobs must never touch files
        # from earlier jobs
        self._job = uuid.uuid4().hex[:8]

    def write(self, iterator: Iterator[pa.RecordBatch]
              ) -> _FileCommit:
        fname = f"part-{self._job}-{uuid.uuid4().hex[:12]}.parquet"
        rows = _write_file(self._options,
                           os.path.join(self._dst, fname), iterator)
        return _FileCommit(fname if rows else "", rows)

    def commit(self, messages):
        # keep only the winners: speculative/retried attempts may have
        # left THIS job's part files that no commit message names —
        # other jobs' files (no job token match) are untouched
        import json
        keep = {m.file for m in messages if m is not None and m.file}
        mine = glob.glob(
            os.path.join(self._dst, f"part-{self._job}-*.parquet"))
        for f in mine:
            if os.path.basename(f) not in keep:
                os.remove(f)
        # append-only commit log: makes format-written directories
        # consumable as a STREAM source (readStream tails the log)
        with open(os.path.join(self._dst, "_commits.jsonl"), "a") as fh:
            fh.write(json.dumps({"batch": -1,
                                 "files": sorted(keep)}) + "\n")

    def abort(self, messages):
        for m in messages:
            if m is not None and m.file:
                try:
                    os.remove(os.path.join(self._dst, m.file))
                except OSError:
                    pass


class CppParquetStreamWriter(DataSourceStreamArrowWriter):
    """Structured Streaming sink leg of the format: every micro-batch
    lands as real .parquet files from our emitters, EXACTLY-ONCE via a
    stage-then-move commit — tasks write into ``_tmp/``, the driver's
    `commit` moves only the files named by successful commit messages
    into the directory root and records the batch id in
    ``_commits.jsonl``; a REPLAYED batch (same id after a restart) is
    detected there and its staged output dropped, so the sink directory
    only ever holds each batch's winners once. Readers (our batch
    format, pyarrow, DuckDB, Spark) glob ``*.parquet`` at the root and
    never see staged or replayed attempts."""

    def __init__(self, options, schema, overwrite: bool):
        self._options = options
        self._dst = options.get("path")
        if not self._dst:
            raise ValueError(f"{FORMAT_NAME}: a path is required")
        self._tmp = os.path.join(self._dst, "_tmp")
        os.makedirs(self._tmp, exist_ok=True)
        self._log = os.path.join(self._dst, "_commits.jsonl")

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _FileCommit:
        fname = f"part-{uuid.uuid4().hex[:16]}.parquet"
        rows = _write_file(self._options,
                           os.path.join(self._tmp, fname), iterator)
        return _FileCommit(fname if rows else "", rows)

    def _log_entries(self) -> dict[int, list[str]]:
        import json
        if not os.path.exists(self._log):
            return {}
        out: dict[int, list[str]] = {}
        with open(self._log) as fh:
            for ln in fh:
                if ln.strip():
                    e = json.loads(ln)
                    out[e["batch"]] = e["files"]
        return out

    def _clear_tmp(self) -> None:
        for f in glob.glob(os.path.join(self._tmp, "*.parquet")):
            try:
                os.remove(f)
            except OSError:
                pass

    def _publish(self, files: list[str]) -> None:
        for f in files:
            src = os.path.join(self._tmp, f)
            if os.path.exists(src):
                os.replace(src, os.path.join(self._dst, f))

    def commit(self, messages, batchId: int) -> None:
        # crash-safe exactly-once, write-ahead order: (1) append the
        # {batch, files} INTENT to the log, (2) publish the staged
        # files, (3) clear leftovers. A crash between (1) and (2)
        # replays the batch with its intent already logged — the replay
        # branch COMPLETES the publish for any intent file still in
        # _tmp (never re-publishing its own fresh attempt), so no
        # ordering window loses or duplicates rows.
        import json
        winners = [m.file for m in messages if m is not None and m.file]
        logged = self._log_entries()
        if batchId in logged:
            # replayed batch: finish the LOGGED files' publish if the
            # earlier attempt died mid-move, then drop this attempt's
            # freshly staged duplicates
            self._publish(logged[batchId])
            self._clear_tmp()
            return
        with open(self._log, "a") as fh:
            fh.write(json.dumps({"batch": batchId,
                                 "files": sorted(winners)}) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        self._publish(winners)
        self._clear_tmp()              # failed/speculative attempts

    def abort(self, messages, batchId: int) -> None:
        self._clear_tmp()


class CppParquetStreamReader(DataSourceStreamReader):
    """Structured Streaming SOURCE leg: tails a format-written
    directory's append-only ``_commits.jsonl`` — each micro-batch reads
    the files named by the log lines between the start and end offsets
    (``{"commits": n}``), one executor task per file through our
    kernels. Log-based offsets make the tail append-stable (file names
    are uuids, so a directory listing is NOT ordered by arrival) and
    replay-exact: the same offset range always names the same files.
    Directories without the log (e.g. `export_parquet` output) are
    rejected with a pointer to the batch reader."""

    def __init__(self, options, schema):
        self._dst = options.get("path")
        if not self._dst:
            raise ValueError(f"{FORMAT_NAME}: a path is required")
        self._log = os.path.join(self._dst, "_commits.jsonl")
        self._columns = [f.name for f in schema.fields]

    def _lines(self) -> list[str]:
        if not os.path.exists(self._log):
            return []
        with open(self._log) as fh:
            return [ln for ln in fh if ln.strip()]

    def initialOffset(self) -> dict:
        return {"commits": 0}

    def latestOffset(self) -> dict:
        if not os.path.exists(self._log):
            # a directory that already HOLDS parquet files but no
            # commit log was written by something else (export_parquet,
            # a foreign writer) — an empty stream forever would be a
            # silent wrong answer; an EMPTY/not-yet-created directory
            # is a sink that has not produced its first batch, which
            # legitimately streams zero rows for now
            if os.path.isdir(self._dst) and \
                    glob.glob(os.path.join(self._dst, "*.parquet")):
                raise ValueError(
                    f"{FORMAT_NAME} stream source: {self._dst!r} has "
                    "parquet files but no _commits.jsonl — it was not "
                    "written by this format; use the batch reader "
                    "(spark.read.format) instead")
            return {"commits": 0}
        return {"commits": len(self._lines())}

    def partitions(self, start: dict, end: dict):
        import json
        lines = self._lines()[start["commits"]:end["commits"]]
        files = [f for ln in lines for f in json.loads(ln)["files"]]
        return [RowGroupPartition(os.path.join(self._dst, f), -1)
                for f in files]

    def read(self, part: RowGroupPartition
             ) -> Iterator[pa.RecordBatch]:
        yield from _read_rg(part.path, part.rgi, self._columns)

    def commit(self, end: dict) -> None:
        pass                               # the log is append-only


class CppParquetDataSource(DataSource):
    """`spark.dataSource.register(CppParquetDataSource)` enables
    ``format("cpp_parquet")`` for batch read/write AND as a Structured
    Streaming sink (`df.writeStream.format("cpp_parquet")`) and source
    (`spark.readStream.format("cpp_parquet")`, commit-log tailing)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        from . import interop
        from .export import _spark_type_of
        files = _files_of(self.options)
        ftypes = interop.footer_schema(files[0])
        want = self.options.get("columns")
        if want:
            sel = [c for c in want.split(",") if c]
            missing = [c for c in sel if c not in ftypes]
            if missing:
                raise ValueError(f"{FORMAT_NAME}: projection names "
                                 f"unknown columns {missing}")
            ftypes = {c: ftypes[c] for c in sel}
        return ", ".join(f"`{n}` {_spark_type_of(t)}"
                         for n, t in ftypes.items())

    def reader(self, schema) -> CppParquetReader:
        return CppParquetReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> CppParquetWriter:
        return CppParquetWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool
                     ) -> CppParquetStreamWriter:
        return CppParquetStreamWriter(self.options, schema, overwrite)

    def streamReader(self, schema) -> CppParquetStreamReader:
        return CppParquetStreamReader(self.options, schema)
