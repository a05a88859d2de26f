"""Custom streaming source via Spark 4's Python Data Source API.

The engine's default stream source is chunked parquet files read with
``maxFilesPerTrigger`` (``transcripts_source.py``) — the Iceberg-
snapshot-stream analog the reference's Glue jobs consume. This module
provides the same arrival-ordered turn stream as a REAL registered
source (``spark.dataSource.register`` +
``readStream.format("synth_transcripts")``), demonstrating the full
source contract the file shortcut hides:

  * ``initialOffset`` / ``latestOffset`` — offsets are row positions in
    the arrival-ordered log ``{"row": n}``; rate control caps each
    micro-batch at ``rowsPerBatch`` rows (the reference's bookmark +
    bounded-read pattern, ``app.py`` incremental scans).
  * ``partitions(start, end)`` — each micro-batch splits into
    ``numPartitions`` row ranges, one Spark task each: planning is
    driver-side metadata only; DATA is read executor-side.
  * ``read(partition)`` — executor-side pyarrow range scan yielding
    Arrow RecordBatches (zero row-at-a-time Python; the §2.9 rule).
  * ``commit(end)`` — the engine's signal that offsets ≤ end are
    durable; replay after restart re-reads exactly the checkpointed
    range, which is what makes the downstream exactly-once sinks hold
    end-to-end (pinned by the kill/resume pytest).

Restart semantics: Spark restores offsets from the checkpoint, replans
the pending batch via ``partitions(start, end)``, and commits restored
batches — the reader's rate-limit cursor self-repairs from whichever of
those arrives first (it keeps a MAX, never trusts its own memory), so a
fresh reader instance on a restarted query can never emit an offset
below the checkpoint (which would move the log backward and lose data).

Scale shape: offsets over a replayable ordered log is exactly the
production contract (Kafka offsets / Iceberg snapshot ids); the
synthetic backing store is one parquet file, and ``read`` slices it by
row range per task. At real scale the same class fronts an object-store
manifest where ``partitions`` maps offset ranges to file splits —
nothing in the offset/planning/commit protocol changes.

Reference parity: SURVEY §1.4 / §2.1 S6 (grouped incremental scan with
bookmarks) re-expressed as a first-class Spark source instead of a
file-listing trick.
"""

from __future__ import annotations

import bisect
import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _ordered_log(path: str) -> list[tuple[str, int]]:
    """Resolve ``path`` (a parquet file or a directory of them) to the
    arrival-ordered log: [(file, n_rows), …]. Directory order is
    (mtime, name) — the same order the file stream source with
    ``latestFirst=false`` processes, and the order the flushed-source
    builder encodes in its mtimes — so a drain through this source sees
    the identical arrival sequence."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "*.parquet")),
            key=lambda f: (os.stat(f).st_mtime_ns, f),
        )
        if not files:
            raise ValueError(f"no *.parquet files under {path}")
    else:
        files = [path]
    return [(f, pq.ParquetFile(f).metadata.num_rows) for f in files]


class _RangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _read_range(path: str, start: int, end: int):
    """Executor-side range scan: row-group-pruned pyarrow read, sliced
    to [start, end) and yielded as Arrow RecordBatches (vectorized all
    the way into Spark's Arrow ingestion — no per-row Python)."""
    import pyarrow.parquet as pq

    if end <= start:
        return
    pf = pq.ParquetFile(path)
    # prune row groups outside the range (metadata-only), then slice the
    # residual rows; with one giant file per sf this is a no-op, but it
    # is the honest shape for a multi-row-group production log
    groups, first_row = [], 0
    rows_before = 0
    for i in range(pf.metadata.num_row_groups):
        n = pf.metadata.row_group(i).num_rows
        if rows_before + n > start and rows_before < end:
            if not groups:
                first_row = rows_before
            groups.append(i)
        rows_before += n
    if not groups:
        return
    table = pf.read_row_groups(groups)
    sliced = table.slice(start - first_row, end - start)
    yield from sliced.to_batches()


class SynthTranscriptsDataSource(DataSource):
    """``spark.dataSource.register(SynthTranscriptsDataSource)`` then
    ``spark.readStream.format("synth_transcripts").option("sf", "0.001")
    .option("rowsPerBatch", "500").load()``. Batch reads (``spark.read``)
    are supported too (full log, range-partitioned).

    Backing log: ``option("path", …)`` points at any parquet file or
    directory of them (e.g. the flushed drain source) — this is how the
    graded streaming drain runs through the registered source; without
    it the synthetic log for ``option("sf", …)`` is generated on demand.
    Rate control: ``rowsPerBatch`` (row-granular) or ``filesPerBatch``
    (micro-batch boundaries at arrival-order file boundaries — the
    ``maxFilesPerTrigger`` analog, so a drain through this source sees
    the same batch structure as the file-source stand-in)."""

    @classmethod
    def name(cls) -> str:
        return "synth_transcripts"

    def schema(self) -> str:
        return SCHEMA_DDL

    def _log(self) -> list[tuple[str, int]]:
        path = self.options.get("path")
        if path is None:
            from ..datagen import ensure_transcripts

            path = ensure_transcripts(float(self.options.get("sf", "0.001")))
        return _ordered_log(path)

    def reader(self, schema) -> DataSourceReader:
        return _SynthBatchReader(self._log(), _check_parts(self.options))

    def streamReader(self, schema) -> DataSourceStreamReader:
        fpb = self.options.get("filesperbatch")
        return _SynthStreamReader(
            self._log(),
            rows_per_batch=int(self.options.get("rowsperbatch", "500")),
            n_parts=_check_parts(self.options),
            files_per_batch=int(fpb) if fpb is not None else None,
        )


def _check_parts(options) -> int:
    """numPartitions must be >= 1 — a non-positive step would walk
    _range_partitions backward forever (rowsPerBatch/filesPerBatch are
    validated; this closes the same gap for the partition knob)."""
    n = int(options.get("numpartitions", "4"))
    if n < 1:
        raise ValueError(f"numPartitions must be >= 1, got {n}")
    return n


def _range_partitions(log, s, e, step):
    """Global row range [s, e) → per-file _RangePartitions of ≤ step
    rows (LOCAL offsets; a stride crossing a file boundary splits)."""
    out, file_lo = [], 0
    for path, n in log:
        file_hi = file_lo + n
        lo = max(s, file_lo)
        while lo < min(e, file_hi):
            hi = min(lo + step, e, file_hi)
            out.append(_RangePartition(path, lo - file_lo, hi - file_lo))
            lo = hi
        file_lo = file_hi
    return out


class _SynthBatchReader(DataSourceReader):
    def __init__(self, log: list[tuple[str, int]], n_parts: int):
        self.log, self.n_parts = log, n_parts
        self.n_rows = sum(n for _, n in log)

    def partitions(self):
        step = -(-self.n_rows // self.n_parts) if self.n_rows else 1
        return _range_partitions(self.log, 0, self.n_rows, step)

    def read(self, partition: _RangePartition):
        # pyspark substitutes [None] for an empty partition plan (e.g. a
        # 0-row log) — yield nothing instead of crashing on .path
        if partition is None:
            return
        yield from _read_range(partition.path, partition.start, partition.end)


class _SynthStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        log: list[tuple[str, int]] | str,
        n_rows: int | None = None,
        rows_per_batch: int = 500,
        n_parts: int = 4,
        files_per_batch: int | None = None,
    ):
        # legacy signature (path, n_rows, …) kept for the unit tests
        if isinstance(log, str):
            log = [(log, int(n_rows))]
        if rows_per_batch <= 0:
            raise ValueError(f"rowsPerBatch must be positive, got {rows_per_batch}")
        if files_per_batch is not None and files_per_batch <= 0:
            raise ValueError(f"filesPerBatch must be positive, got {files_per_batch}")
        self.log = log
        self.n_rows = sum(n for _, n in log)
        # cumulative end-of-file global offsets — the legal cursor stops
        # in filesPerBatch mode
        self._file_ends: list[int] = []
        acc = 0
        for _, n in log:
            acc += n
            self._file_ends.append(acc)
        self.rows_per_batch, self.n_parts = rows_per_batch, n_parts
        self.files_per_batch = files_per_batch
        # rate-limit cursor: advisory only — repaired upward from every
        # offset Spark hands back (commit / partitions), never the other
        # way, so a restarted query's fresh reader cannot rewind the log
        self._cursor = 0

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # advance at most one rate-control quantum past everything known
        # durable — the rate-control half of the reference's bookmark
        # pattern. filesPerBatch mode advances to the end of the next N
        # not-fully-consumed files (file-boundary micro-batches, the
        # maxFilesPerTrigger analog); rowsPerBatch mode is row-granular.
        if self.files_per_batch is not None:
            consumed = bisect.bisect_right(self._file_ends, self._cursor)
            nxt = min(consumed + self.files_per_batch, len(self._file_ends))
            if nxt > consumed:
                self._cursor = self._file_ends[nxt - 1]
        else:
            self._cursor = min(self._cursor + self.rows_per_batch, self.n_rows)
        return {"row": self._cursor}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["row"]), int(end["row"])
        # self-repair on restart: Spark replans the pending batch from
        # the checkpoint before ever calling latestOffset
        self._cursor = max(self._cursor, e)
        if e <= s:
            return []
        step = -(-(e - s) // self.n_parts)
        return _range_partitions(self.log, s, e, step)

    def read(self, partition: _RangePartition):
        if partition is None:  # engine's empty-plan sentinel
            return
        yield from _read_range(partition.path, partition.start, partition.end)

    def commit(self, end: dict) -> None:
        # restored-batch commits on restart repair the cursor too
        self._cursor = max(self._cursor, int(end["row"]))

    def stop(self) -> None:
        pass
