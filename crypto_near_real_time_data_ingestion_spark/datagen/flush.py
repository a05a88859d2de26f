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
import hashlib
import os
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .transcripts import SCHEMA

FLUSH_CONV_ID = "__flush__"
_FP_SIDECAR = "_src_fingerprint"


def _src_fingerprint(files: list[str], flush_hours: int) -> str:
    """Name+size+mtime digest of the source part-files (plus the sentinel
    config). Size alone would miss a content change that preserves every
    part-file's encoded size (e.g. fixed-width value flips under the same
    codec); mtime_ns closes that hole at the cost of one cheap spurious
    copy-rebuild after a byte-identical regeneration."""
    h = hashlib.md5()
    h.update(f"flush_hours={flush_hours}".encode())
    for f in files:
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()


def build_flushed_source(src_stream_dir: str, dest_dir: str, flush_hours: int = 26) -> str:
    """Copy stream part-files to ``dest_dir`` with ordered mtimes and append
    a sentinel flush file. Returns ``dest_dir``. Idempotent AND
    self-invalidating: a fingerprint sidecar records the source's
    (name, size) set, so regenerating the transcripts after a generator
    change rebuilds the copy instead of silently serving stale data; the
    copy is built in a per-process temp dir and atomically renamed into
    place under an O_EXCL lock, so an interrupted build can never leave a
    half-populated dir that passes the fingerprint check and concurrent
    builders (bench worker vs pytest) cannot clobber each other.

    ``flush_hours`` must clear the LONGEST streamed window grain plus the
    watermark: 26 h covers a day window whose end lies up to 24 h past
    the last event (hour/sliding/session need far less)."""
    files = sorted(glob.glob(os.path.join(src_stream_dir, "part-*.parquet")))
    fp_want = _src_fingerprint(files, flush_hours)
    fp_file = os.path.join(dest_dir, _FP_SIDECAR)
    if os.path.isfile(fp_file) and open(fp_file).read() == fp_want:
        return dest_dir
    # Cross-process exclusion: bench workers and a concurrent pytest can
    # race to (re)build the same /tmp-shared copy. An O_EXCL lock file
    # serializes the swap; losers wait, then re-check the fingerprint (the
    # winner usually built exactly what they wanted). A lock older than
    # 10 min is presumed orphaned (builder crashed) and broken.
    parent = os.path.dirname(dest_dir.rstrip(os.sep)) or "."
    os.makedirs(parent, exist_ok=True)
    lock_path = dest_dir.rstrip(os.sep) + ".lock"
    while True:
        try:
            lock_fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                if time.time() - os.stat(lock_path).st_mtime > 600:
                    os.unlink(lock_path)
                    continue
            except FileNotFoundError:
                continue
            time.sleep(0.5)
    try:
        if os.path.isfile(fp_file) and open(fp_file).read() == fp_want:
            return dest_dir
        tmp_dir = tempfile.mkdtemp(prefix=os.path.basename(dest_dir.rstrip(os.sep)) + ".build-", dir=parent)
        return _build_into(tmp_dir, dest_dir, files, fp_want, flush_hours)
    finally:
        os.close(lock_fd)
        try:
            os.unlink(lock_path)
        except FileNotFoundError:
            pass


def _build_into(tmp_dir: str, dest_dir: str, files: list[str], fp_want: str, flush_hours: int) -> str:
    try:
        return _build_into_inner(tmp_dir, dest_dir, files, fp_want, flush_hours)
    except BaseException:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise


def _build_into_inner(tmp_dir: str, dest_dir: str, files: list[str], fp_want: str, flush_hours: int) -> str:
    base = 1_000_000_000
    max_ts = None
    for i, f in enumerate(files):
        d = os.path.join(tmp_dir, os.path.basename(f))
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
    fp = os.path.join(tmp_dir, "zz-flush.parquet")
    pq.write_table(pa.Table.from_pandas(flush, schema=SCHEMA, preserve_index=False), fp)
    os.utime(fp, (base + len(files), base + len(files)))
    with open(os.path.join(tmp_dir, _FP_SIDECAR), "w") as fh:
        fh.write(fp_want)
    shutil.rmtree(dest_dir, ignore_errors=True)
    os.rename(tmp_dir, dest_dir)
    return dest_dir
