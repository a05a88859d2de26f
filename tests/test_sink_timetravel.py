"""Time travel on the MERGE sink: the Iceberg/Delta ``VERSION AS OF``
analog over the LSM-ish delta layout. Contract under test:

  * ``read_as_of(b)`` is the merged view as it stood after batch b
    committed — pure path selection (snapshot + deltas ≤ b), no row
    filtering, using the same per-class fold as ``read``;
  * the newest version equals ``read()`` (and any future id does too);
  * compaction EXPIRES history: ids below the marker fail loudly
    (Iceberg snapshot expiration), the horizon itself stays readable,
    and post-compaction deltas time-travel on top of the snapshot;
  * the additive sketch sink inherits time travel with ITS fold — a
    prefix read reports the prefix's counts and certified bound.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crypto_near_real_time_data_ingestion_spark.operators.heavy_hitters import (
    _SENTINEL,
)
from crypto_near_real_time_data_ingestion_spark.streaming.sinks import (
    AdditiveSummarySink,
    ParquetMergeSink,
)

FRAMES = [
    [("a", 1), ("b", 1)],
    [("b", 2), ("c", 2)],          # upserts b
    [("a", 3), ("d", 3)],          # upserts a
    [("c", 4)],                    # upserts c
]


def _mk_keyed(spark, tmp_path, upto=len(FRAMES)):
    sink = ParquetMergeSink(str(tmp_path / "t"), keys=["k"], event_time_col="v")
    for bid, rows in enumerate(FRAMES[:upto]):
        sink.process_batch(spark.createDataFrame(rows, "k string, v int"), bid)
    return sink


def _as_of_pdf(sink, spark, b) -> pd.DataFrame:
    return (
        sink.read_as_of(spark, b)
        .toPandas()
        .sort_values(sink.keys)
        .reset_index(drop=True)
    )


def test_every_prefix_version_is_reconstructed(spark, tmp_path):
    """read_as_of(b) == what read() returned when b was the newest
    batch (checked against an independently-written prefix sink)."""
    sink = _mk_keyed(spark, tmp_path)
    for b in range(len(FRAMES)):
        prefix = _mk_keyed(spark, tmp_path / f"prefix{b}", upto=b + 1)
        want = prefix.read(spark).toPandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(_as_of_pdf(sink, spark, b), want)
    # explicit content spot-check of an interior version
    v1 = _as_of_pdf(sink, spark, 1)
    assert dict(zip(v1.k, v1.v)) == {"a": 1, "b": 2, "c": 2}


def test_newest_and_future_versions_equal_current_read(spark, tmp_path):
    sink = _mk_keyed(spark, tmp_path)
    now = sink.read(spark).toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(_as_of_pdf(sink, spark, 3), now)
    pd.testing.assert_frame_equal(_as_of_pdf(sink, spark, 99), now)
    assert sink.versions() == [0, 1, 2, 3]


def test_compaction_expires_history_but_keeps_the_horizon(spark, tmp_path):
    sink = _mk_keyed(spark, tmp_path)
    at_horizon = _as_of_pdf(sink, spark, 3)
    sink.compact(spark)
    # below the marker: loud failure, not nearest-surviving-state
    with pytest.raises(ValueError, match="history expired"):
        sink.read_as_of(spark, 2)
    # the horizon itself is the snapshot — still readable, identical
    pd.testing.assert_frame_equal(_as_of_pdf(sink, spark, 3), at_horizon)
    assert sink.versions() == [3]

    # deltas written after compaction time-travel on top of the snapshot
    sink.process_batch(spark.createDataFrame([("a", 5)], "k string, v int"), 4)
    sink.process_batch(spark.createDataFrame([("e", 6)], "k string, v int"), 5)
    assert sink.versions() == [3, 4, 5]
    v4 = _as_of_pdf(sink, spark, 4)
    assert dict(zip(v4.k, v4.v)) == {"a": 5, "b": 2, "c": 4, "d": 3}
    v5 = _as_of_pdf(sink, spark, 5)
    assert dict(zip(v5.k, v5.v)) == {"a": 5, "b": 2, "c": 4, "d": 3, "e": 6}
    now = sink.read(spark).toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(v5, now)


def test_additive_sink_time_travels_with_its_own_fold(spark, tmp_path):
    """The sketch sink's prefix view reports the PREFIX's pointwise sums
    and certified bound — inherited via the shared _read_from_paths."""
    sink = AdditiveSummarySink(str(tmp_path / "hh"))
    deltas = [
        [("x", 3, 0), ("y", 1, 0), (_SENTINEL, 0, 2)],
        [("x", 2, 0), ("z", 5, 0)],
        [("y", 4, 0), (_SENTINEL, 0, 1)],
    ]
    for bid, rows in enumerate(deltas):
        sink.process_batch(
            spark.createDataFrame(rows, "token string, count long, decrement long"),
            bid,
        )
    v1 = sink.read_as_of(spark, 1).toPandas().sort_values("token")
    assert dict(zip(v1.token, v1["count"])) == {"x": 5, "y": 1, "z": 5}
    assert set(v1.max_undercount) == {2}
    v2 = sink.read_as_of(spark, 2).toPandas().sort_values("token")
    assert dict(zip(v2.token, v2["count"])) == {"x": 5, "y": 5, "z": 5}
    assert set(v2.max_undercount) == {3}
