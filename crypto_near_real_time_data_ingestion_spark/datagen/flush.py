"""Flushed stream-source builder for equivalence tests and drains.

Append-mode streaming aggregations only emit a window once the watermark
passes its end. To compare a drained stream against the batch oracle over
a FINITE input, the source is copied and extended with one sentinel row
(``conv_id='__flush__'``) whose event time lies far beyond the real data,
advancing the watermark past every real window. The sentinel conversation
is filtered out of all comparisons. File mtimes are set in arrival order
so the file stream source preserves the generator's arrival sequence.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .transcripts import SCHEMA

FLUSH_CONV_ID = "__flush__"


def build_flushed_source(src_stream_dir: str, dest_dir: str, flush_hours: int = 26) -> str:
    """Copy stream part-files to ``dest_dir`` with ordered mtimes and append
    a sentinel flush file. Returns ``dest_dir``. Idempotent.

    ``flush_hours`` must clear the LONGEST streamed window grain plus the
    watermark: 26 h covers a day window whose end lies up to 24 h past
    the last event (hour/sliding/session need far less)."""
    if os.path.isdir(dest_dir) and glob.glob(os.path.join(dest_dir, "zz-flush.parquet")):
        return dest_dir
    os.makedirs(dest_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(src_stream_dir, "part-*.parquet")))
    base = 1_000_000_000
    max_ts = None
    for i, f in enumerate(files):
        d = os.path.join(dest_dir, os.path.basename(f))
        shutil.copy(f, d)
        os.utime(d, (base + i, base + i))
        m = pq.read_table(f, columns=["ts"])["ts"].to_pandas().max()
        max_ts = m if max_ts is None or m > max_ts else max_ts
    flush = pd.DataFrame(
        {
            "conv_id": [FLUSH_CONV_ID],
            "turn_idx": np.array([0], dtype="int32"),
            "role": ["user"],
            "text": ["flush"],
            "tool": [None],
            "ts": [max_ts + pd.Timedelta(hours=flush_hours)],
        }
    )
    fp = os.path.join(dest_dir, "zz-flush.parquet")
    pq.write_table(pa.Table.from_pandas(flush, schema=SCHEMA, preserve_index=False), fp)
    os.utime(fp, (base + len(files), base + len(files)))
    return dest_dir
