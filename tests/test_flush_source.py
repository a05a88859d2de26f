"""build_flushed_source cache invalidation (no Spark needed).

The flushed copy is shared by every drain in a session AND cached across
sessions in /tmp — round 3 made it self-invalidating (fingerprint
sidecar + atomic tmp-dir rename) after review flagged that a stale copy
could outlive a transcripts regeneration and feed every streaming oracle
old data while the batch side read fresh parquet.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crypto_near_real_time_data_ingestion_spark.datagen.flush import (
    build_flushed_source,
)
from crypto_near_real_time_data_ingestion_spark.datagen.transcripts import SCHEMA


@pytest.fixture
def dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return str(src), str(tmp_path / "dst")


def _write(src: str, fname: str, n: int) -> None:
    df = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(n)],
            "turn_idx": np.arange(n, dtype="int32"),
            "role": ["user"] * n,
            "text": ["x"] * n,
            "tool": [None] * n,
            "ts": pd.to_datetime(["2025-01-01"] * n)
            + pd.to_timedelta(np.arange(n), unit="s"),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, schema=SCHEMA, preserve_index=False),
        os.path.join(src, fname),
    )


def test_flush_source_rebuilds_on_source_change(dirs):
    src, dst = dirs
    _write(src, "part-00000.parquet", 5)
    build_flushed_source(src, dst)
    flush_mtime = os.path.getmtime(os.path.join(dst, "zz-flush.parquet"))

    # unchanged source: cache hit, nothing rewritten
    build_flushed_source(src, dst)
    assert os.path.getmtime(os.path.join(dst, "zz-flush.parquet")) == flush_mtime

    # changed content (generator change analog): rebuild, fresh copy served
    _write(src, "part-00000.parquet", 7)
    build_flushed_source(src, dst)
    assert pq.read_table(os.path.join(dst, "part-00000.parquet")).num_rows == 7

    # new part file: rebuild includes it, mtimes stay in arrival order
    _write(src, "part-00001.parquet", 3)
    build_flushed_source(src, dst)
    names = sorted(f for f in os.listdir(dst) if f.endswith(".parquet"))
    assert "part-00001.parquet" in names and names[-1] == "zz-flush.parquet"
    mtimes = [os.path.getmtime(os.path.join(dst, f)) for f in names]
    assert mtimes == sorted(mtimes)


def test_flush_source_rebuilds_on_same_size_change(dirs):
    """A content change that preserves every part-file's size must still
    invalidate (fingerprint includes mtime_ns, not just name:size)."""
    src, dst = dirs
    _write(src, "part-00000.parquet", 5)
    build_flushed_source(src, dst)
    # copied-file mtimes are pinned, so the rebuild witness is the dest
    # directory inode — the atomic rename swaps in a fresh directory
    dir_ino = os.stat(dst).st_ino
    # regenerate byte-identically: same name, same size, new mtime
    _write(src, "part-00000.parquet", 5)
    build_flushed_source(src, dst)
    assert os.stat(dst).st_ino != dir_ino


def test_flush_source_lock_lifecycle(dirs):
    src, dst = dirs
    _write(src, "part-00000.parquet", 5)
    lock = dst.rstrip(os.sep) + ".lock"

    # a stale lock (orphaned by a crashed builder) is broken, not waited on
    os.makedirs(os.path.dirname(lock), exist_ok=True)
    with open(lock, "w"):
        pass
    os.utime(lock, (1, 1))
    build_flushed_source(src, dst)
    assert os.path.isfile(os.path.join(dst, "zz-flush.parquet"))
    # the lock is released after the build, and no tmp build dirs linger
    assert not os.path.exists(lock)
    parent = os.path.dirname(dst)
    assert not [d for d in os.listdir(parent) if ".build-" in d]


def test_flush_source_interrupted_build_not_served(dirs):
    src, dst = dirs
    _write(src, "part-00000.parquet", 5)
    # simulate an interrupted older build: dest exists, files copied, but
    # no fingerprint sidecar was committed
    os.makedirs(dst)
    shutil.copy(
        os.path.join(src, "part-00000.parquet"),
        os.path.join(dst, "part-00000.parquet"),
    )
    build_flushed_source(src, dst)
    assert os.path.isfile(os.path.join(dst, "zz-flush.parquet"))
    assert os.path.isfile(os.path.join(dst, "_src_fingerprint"))
