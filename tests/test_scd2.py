"""SCD Type 2: full-rebuild oracle parity, interval algebra, planted
collapse/dedup cases, and incremental-apply ≡ full-rebuild."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.operators import scd2


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_events_scd2_oracle(spark):
    got = scd2.events_scd2(_events(spark))
    want = duck_sql(scd2.EVENTS_SCD2_ORACLE_SQL)
    assert_df_equal(
        got, want, sort_cols=["user_id", "event_type", "version"]
    )


def test_interval_algebra(spark):
    """Half-open intervals chain without gaps or overlaps; exactly one
    open (is_current) version per key; versions are dense from 1."""
    dim = scd2.events_scd2(_events(spark)).toPandas()
    for (_, _), g in dim.groupby(["user_id", "event_type"]):
        g = g.sort_values("version").reset_index(drop=True)
        assert list(g.version) == list(range(1, len(g) + 1))
        assert g.is_current.sum() == 1 and g.is_current.iloc[-1] == 1
        assert g.valid_to.iloc[:-1].equals(
            g.valid_from.iloc[1:].reset_index(drop=True)
        )
        assert pd.isna(g.valid_to.iloc[-1])


def _log(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "event_id", "tier"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))


T0 = dt.datetime(2024, 1, 1)


def _t(h):
    return T0 + dt.timedelta(hours=h)


def test_planted_collapse_and_same_ts_dedup(spark):
    """The two rules the driver corpus exercises only statistically:
    consecutive-unchanged rows collapse into one version, and equal
    timestamps dedupe keep-highest-seq."""
    log = _log(
        spark,
        [
            (1, "x", _t(0), 10, 5),
            (1, "x", _t(1), 11, 5),   # unchanged → collapsed
            (1, "x", _t(2), 12, 7),   # change → version 2
            (1, "x", _t(2), 13, 8),   # same ts, higher seq wins → tier 8
            (1, "x", _t(3), 14, 8),   # unchanged → collapsed
            (2, "x", _t(0), 20, None),  # NULL first version survives
            (2, "x", _t(1), 21, None),  # NULL → NULL is NOT a change
            (2, "x", _t(2), 22, 3),
        ],
    )
    got = (
        scd2.scd2_history(log)
        .toPandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    assert list(got.user_id) == [1, 1, 2, 2]
    assert list(got.tier.astype("object")) == [5, 8, None, 3] or [
        None if pd.isna(t) else int(t) for t in got.tier
    ] == [5, 8, None, 3]
    assert list(got[got.user_id == 1].valid_from) == [_t(0), _t(2)]
    assert list(got[got.user_id == 2].valid_from) == [_t(0), _t(2)]


def test_incremental_apply_equals_full_rebuild(spark):
    """The MERGE-shaped maintenance path: for an append-only ts split,
    apply(history(batch1), batch2) is row-identical to history(all).
    Checked at several split points, including splits that leave some
    keys absent from one side."""
    ev = _events(spark)
    log = scd2._tiered(ev, scd2.TIER_WIDTH)
    full = scd2.events_scd2(ev).toPandas()
    day = F.expr("CAST(date_trunc('day', ts) AS STRING)")
    days = sorted(
        r["d"] for r in log.select(day.alias("d")).distinct().collect()
    )
    for frac in (0.25, 0.5, 0.9):
        cut = days[int(len(days) * frac)]
        b1 = log.filter(day <= cut)
        b2 = log.filter(day > cut)
        dim1 = scd2.scd2_history(b1)
        merged = scd2.scd2_apply(dim1, b2).toPandas()
        key = ["user_id", "event_type", "version"]
        left = merged.sort_values(key).reset_index(drop=True)
        right = full.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            left[sorted(left.columns)], right[sorted(right.columns)]
        )


def test_apply_rewrites_only_touched_keys(spark):
    """Untouched keys pass through byte-identical (same row objects, no
    version renumbering)."""
    log = _log(
        spark,
        [
            (1, "x", _t(0), 1, 1),
            (1, "x", _t(1), 2, 2),
            (9, "y", _t(0), 3, 4),
        ],
    )
    dim = scd2.scd2_history(log)
    upd = _log(spark, [(9, "y", _t(5), 7, 6)])
    out = scd2.scd2_apply(dim, upd).toPandas()
    u1 = out[out.user_id == 1].sort_values("version")
    assert list(u1.tier) == [1, 2] and list(u1.is_current) == [0, 1]
    u9 = out[out.user_id == 9].sort_values("version")
    assert list(u9.tier) == [4, 6]
    assert list(u9.is_current) == [0, 1]
    assert u9.valid_to.iloc[0] == _t(5)
