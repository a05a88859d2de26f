"""Manifest-based data skipping (`ParquetMergeSink.read_time_range`):
time-bounded reads prune whole deltas using the event-time envelopes the
commit path already records from parquet FOOTER stats — the Iceberg
metadata-pruning analog. Exactness requires event_time_col ∈ keys (every
version of a key carries the same event time), which the method asserts.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from crypto_near_real_time_data_ingestion_spark.streaming.sinks import (
    ParquetMergeSink,
)

T0 = dt.datetime(2025, 3, 1)


def _hour(h: int) -> dt.datetime:
    return T0 + dt.timedelta(hours=h)


def _mk(spark, tmp_path):
    """Three deltas with disjoint hour envelopes + one upsert overlap."""
    sink = ParquetMergeSink(
        str(tmp_path / "tr"), keys=["ts", "k"], event_time_col="ts"
    )
    frames = [
        [(_hour(0), "a", 1), (_hour(1), "a", 1)],
        [(_hour(2), "a", 2), (_hour(3), "b", 2)],
        [(_hour(4), "a", 3), (_hour(1), "a", 30)],   # upserts (h1, a)
    ]
    for bid, rows in enumerate(frames):
        sink.process_batch(
            spark.createDataFrame(rows, "ts timestamp, k string, v int"), bid
        )
    return sink


def _pdf(df) -> pd.DataFrame:
    return df.toPandas().sort_values(["ts", "k"]).reset_index(drop=True)


def test_time_range_equals_full_scan_filter(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    lo, hi = _hour(1), _hour(2)
    got = sink.read_time_range(spark, lo, hi)
    want = sink.read(spark).filter(
        f"ts >= timestamp'{lo}' and ts <= timestamp'{hi}'"
    )
    pd.testing.assert_frame_equal(_pdf(got), _pdf(want))
    # latest-wins survives skipping: the h1 upsert (delta 2) wins
    vals = {(r.ts, r.k): r.v for r in got.collect()}
    assert vals[(_hour(1), "a")] == 30


def test_time_range_skips_non_overlapping_deltas(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    # [h0, h0] overlaps delta 0 only; deltas 1 and 2 both start at h2+...
    # except delta 2 also contains h1 — envelope [h1, h4] overlaps nothing
    # in [h0, h0], so exactly 2 deltas are skipped
    got = sink.read_time_range(spark, _hour(0), _hour(0))
    assert got._skipped_deltas == 2
    assert {(r.ts, r.k) for r in got.collect()} == {(_hour(0), "a")}


def test_time_range_empty_range_returns_empty_with_schema(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    got = sink.read_time_range(spark, _hour(10), _hour(11))
    assert got.count() == 0
    assert set(got.columns) == {"ts", "k", "v"}


def test_time_range_after_compaction_scans_snapshot(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    before = _pdf(sink.read_time_range(spark, _hour(1), _hour(3)))
    sink.compact(spark)
    after = sink.read_time_range(spark, _hour(1), _hour(3))
    pd.testing.assert_frame_equal(_pdf(after), before)
    assert after._skipped_deltas == 0  # single snapshot, nothing skippable


def test_time_range_predicate_pushes_through_window_to_scan(spark, tmp_path):
    """Two pruning levels compose: the manifest skips whole deltas before
    listing, and because event_time is a PARTITION KEY of the latest-wins
    window, Catalyst pushes the range predicate through the window into
    the parquet scan — row-group pruning via the same footer stats."""
    sink = _mk(spark, tmp_path)
    df = sink.read_time_range(spark, _hour(1), _hour(2))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan_lines, plan[:500]
    assert any(
        "ts" in l and ">=" in l and "<=" in l for l in scan_lines
    ), scan_lines[0][:400]


def test_time_range_survives_missing_snapshot_manifest(spark, tmp_path):
    """The live set (marker + commit log) is authoritative; manifests are
    only a skipping index. A snapshot whose manifest write crashed (crash
    after the marker rename) must be SCANNED, not silently dropped."""
    import os

    sink = _mk(spark, tmp_path)
    want = _pdf(sink.read_time_range(spark, _hour(1), _hour(3)))
    sink.compact(spark)
    for f in os.listdir(sink.manifests_dir):
        if f.startswith("compact-"):
            os.remove(os.path.join(sink.manifests_dir, f))
    got = sink.read_time_range(spark, _hour(1), _hour(3))
    pd.testing.assert_frame_equal(_pdf(got), want)


def test_time_range_reroots_manifest_paths(spark, tmp_path):
    """Manifests record absolute paths at write time; reads must re-root
    them under the CURRENT data_dir so a moved/restored table still
    prunes correctly."""
    import shutil

    src_sink = _mk(spark, tmp_path)
    moved = str(tmp_path / "moved")
    shutil.copytree(src_sink.table_dir, moved)
    shutil.rmtree(src_sink.table_dir)
    sink2 = ParquetMergeSink(moved, keys=["ts", "k"], event_time_col="ts")
    got = sink2.read_time_range(spark, _hour(0), _hour(0))
    assert got._skipped_deltas == 2
    assert {(r.ts, r.k) for r in got.collect()} == {(_hour(0), "a")}


def test_time_range_property_random_envelopes(spark, tmp_path):
    """Randomized batches (random hour stamps per key) and random query
    ranges: skip-then-filter must equal scan-then-filter for every case,
    with skipping consistent with the generated envelopes."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    batch = st.dictionaries(
        st.sampled_from("abcd"), st.integers(0, 5), min_size=1, max_size=4
    ).map(lambda d: sorted(d.items()))  # key → hour (ts is part of the key)
    case = st.tuples(
        st.lists(batch, min_size=1, max_size=4),
        st.integers(0, 5), st.integers(0, 5),
    )
    counter = iter(range(10_000))

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(case)
    def run(c):
        batches, a, b = c
        lo_h, hi_h = min(a, b), max(a, b)
        sink = ParquetMergeSink(
            str(tmp_path / f"prop{next(counter)}"),
            keys=["k", "ts"], event_time_col="ts",
        )
        model = {}
        for bid, rows in enumerate(batches):
            sink.process_batch(
                spark.createDataFrame(
                    [(k, _hour(h), bid) for k, h in rows],
                    "k string, ts timestamp, v int",
                ),
                bid,
            )
            for k, h in rows:
                model[(k, _hour(h))] = bid
        got = {
            (r.k, r.ts): r.v
            for r in sink.read_time_range(spark, _hour(lo_h), _hour(hi_h)).collect()
        }
        want = {
            (k, ts): v for (k, ts), v in model.items()
            if _hour(lo_h) <= ts <= _hour(hi_h)
        }
        assert got == want, (got, want)

    run()


def test_time_range_requires_event_time_key(spark, tmp_path):
    sink = ParquetMergeSink(str(tmp_path / "bad"), keys=["k"], event_time_col="ts")
    with pytest.raises(ValueError, match="event_time_col to be a key"):
        sink.read_time_range(spark, _hour(0), _hour(1))
