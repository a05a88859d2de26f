"""ts-ordered file-stream source builder for the driver's events table.

The transcripts stream has its own generator + flush tooling
(``datagen/flush.py``); events-table streaming tests/drains (funnel,
SCD2 maintenance) need the same two properties from a finite parquet
table: arrival order = event-time order (chunked by ts, mtimes
ascending) and — for watermark-driven operators — a far-future sentinel
row that flushes every real window. Deterministic: sorted, contiguous
slices, fixed mtime base; no RNG, no wall clock.
"""

from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

FLUSH_EVENT_ID = -1
_MTIME_BASE = 1_700_000_000


def build_events_stream_source(
    events_parquet: str,
    out_dir: str,
    n_chunks: int = 4,
    sentinel: bool = True,
    flush_days: int = 3,
) -> str:
    """Chunk an events parquet into a ts-ordered file-stream source.

    ``sentinel=True`` appends one flush row (event_id = −1, event_type
    '__flush__', ts = max + ``flush_days``) as the LAST file so a
    watermark passes all real data; filter ``event_id >= 0`` from
    results. foreachBatch-style consumers that need no watermark pass
    ``sentinel=False``.
    """
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    t = pq.read_table(events_parquet).sort_by(
        [("ts", "ascending"), ("event_id", "ascending")]
    )
    # chunk boundaries advance to the next DISTINCT ts: equal-ts rows of
    # one key split across micro-batches would break the SCD2 runner's
    # append-only contract (the same-ts keep-latest dedup must see both
    # rows in one batch) — the arrival order must respect event time at
    # timestamp granularity, not row granularity
    ts = t["ts"].to_numpy()
    per = -(-t.num_rows // n_chunks)
    bounds = [0]
    for i in range(1, n_chunks):
        b = i * per
        while 0 < b < t.num_rows and ts[b] == ts[b - 1]:
            b += 1
        bounds.append(min(b, t.num_rows))
    bounds.append(t.num_rows)
    paths = []
    for i in range(n_chunks):
        chunk = t.slice(bounds[i], bounds[i + 1] - bounds[i])
        if chunk.num_rows:
            p = os.path.join(out_dir, f"part-{i:05d}.parquet")
            pq.write_table(chunk, p)
            paths.append(p)
    if sentinel:
        flush_ts = pa.compute.max(t["ts"]).as_py() + datetime.timedelta(
            days=flush_days
        )
        row = pa.table(
            {
                "event_id": pa.array([FLUSH_EVENT_ID], pa.int64()),
                "ts": pa.array([flush_ts], t.schema.field("ts").type),
                "user_id": pa.array([0], pa.int64()),
                "event_type": pa.array(["__flush__"]),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"]),
            }
        ).select([f.name for f in t.schema])
        p = os.path.join(out_dir, f"part-{n_chunks:05d}.parquet")
        pq.write_table(row.cast(t.schema), p)
        paths.append(p)
    for i, path in enumerate(paths):
        os.utime(path, (_MTIME_BASE + i, _MTIME_BASE + i))
    return out_dir
