"""Forward as-of join + k-step funnel: DuckDB oracle parity, planted
edge semantics (strict >, horizon cut, broken chain), and the SCD2
point-in-time lookup composition."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.operators import funnel, scd2


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_funnel_daily_oracle(spark):
    got = funnel.events_funnel_daily(_events(spark))
    want = duck_sql(funnel.funnel_oracle_sql())
    assert_df_equal(got, want, sort_cols=["day"])


def test_funnel_two_step_oracle(spark):
    """A different step list + horizon exercises the template generator."""
    got = funnel.events_funnel_daily(
        _events(spark), steps=("signup", "purchase"), horizon_s=7200
    )
    want = duck_sql(
        funnel.funnel_oracle_sql(steps=("signup", "purchase"), horizon_s=7200)
    )
    assert_df_equal(got, want, sort_cols=["day"])


T0 = dt.datetime(2024, 1, 1)


def _t(mins):
    return T0 + dt.timedelta(minutes=mins)


def _mini_events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_planted_funnel_semantics(spark):
    """Strict > (an equal-time step-2 does NOT count), horizon inclusive
    at exactly +H, chain breaks stay broken, and each step matches the
    EARLIEST eligible event."""
    ev = _mini_events(
        spark,
        [
            # u1: click at +0 equal-time with view → NOT a match;
            #     click at +60 (exactly horizon) → match; purchase +61
            (1, 1, "view", _t(0)),
            (2, 1, "click", _t(0)),
            (3, 1, "click", _t(60)),
            (4, 1, "purchase", _t(61)),
            # u2: click 61 min after view → outside horizon → chain dead,
            #     later purchase must stay unmatched
            (5, 2, "view", _t(0)),
            (6, 2, "click", _t(61)),
            (7, 2, "purchase", _t(62)),
            # u3: two clicks; the EARLIEST (+5) anchors the purchase
            #     horizon, so purchase at +70 (65 min later) misses
            (8, 3, "view", _t(0)),
            (9, 3, "click", _t(5)),
            (10, 3, "click", _t(50)),
            (11, 3, "purchase", _t(70)),
        ],
    )
    got = (
        funnel.funnel_events(ev, ("view", "click", "purchase"), horizon_s=3600)
        .toPandas()
        .set_index("event_id")
    )
    assert got.loc[1, "ts_1"] == _t(60) and got.loc[1, "ts_2"] == _t(61)
    assert pd.isna(got.loc[5, "ts_1"]) and pd.isna(got.loc[5, "ts_2"])
    assert got.loc[8, "ts_1"] == _t(5) and pd.isna(got.loc[8, "ts_2"])


def test_forward_asof_matches_backward_shape(spark):
    """Forward join attaches the earliest strictly-later right row and
    nulls when none exists."""
    left = _mini_events(spark, [(1, 1, "x", _t(10)), (2, 1, "x", _t(99))]).select(
        "event_id", "user_id", "ts"
    )
    right = _mini_events(
        spark, [(3, 1, "y", _t(10)), (4, 1, "y", _t(20)), (5, 1, "y", _t(30))]
    ).select("user_id", F.col("ts").alias("rts"))
    out = (
        funnel.asof_join_forward(
            left, right, keys=["user_id"], left_time="ts",
            right_time="rts", payload=[],
        )
        .toPandas()
        .set_index("event_id")
    )
    assert out.loc[1, "next_rts"] == _t(20)  # strict: the +10 right skipped
    assert pd.isna(out.loc[2, "next_rts"])


def test_forward_asof_null_left_time_attaches_nothing(spark):
    """A NULL left_time row must gain NULLs, with or without a horizon:
    NULL __t sorts last under desc ordering so its growing frame spans
    everything — ungated it would attach the globally earliest right."""
    left = _mini_events(spark, [(1, 1, "x", _t(10)), (2, 1, "x", None)]).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    right = _mini_events(
        spark, [(3, 1, "y", _t(20)), (4, 1, "y", _t(30))]
    ).select("user_id", F.col("ts").alias("rts"))
    for horizon in (None, 3600 * 24):
        out = (
            funnel.asof_join_forward(
                left, right, keys=["user_id"], left_time="ts",
                right_time="rts", payload=[], horizon_s=horizon,
            )
            .toPandas()
            .set_index("event_id")
        )
        assert out.loc[1, "next_rts"] == _t(20), horizon
        assert pd.isna(out.loc[2, "next_rts"]), horizon


def test_funnel_needs_two_steps(spark):
    with pytest.raises(ValueError, match="at least two steps"):
        funnel.funnel_events(_events(spark), steps=("view",))


def test_scd2_lookup_oracle(spark):
    """Point-in-time lookup == the BETWEEN range-join oracle: every fact
    gains the dimension version whose interval contains its ts."""
    ev = _events(spark)
    dim = scd2.events_scd2(ev)
    facts = ev.select("event_id", "user_id", "event_type", "ts")
    got = scd2.scd2_lookup(facts, dim).select(
        "event_id", "dim_tier", "dim_version"
    )
    want = duck_sql(
        f"""
        WITH dim AS ({scd2.EVENTS_SCD2_ORACLE_SQL})
        SELECT e.event_id, d.tier AS dim_tier, d.version AS dim_version
        FROM events e
        LEFT JOIN dim d
          ON d.user_id = e.user_id AND d.event_type = e.event_type
         AND d.valid_from <= e.ts
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        """
    )
    assert_df_equal(got, want, sort_cols=["event_id"])


def test_asof_null_payload_attaches_atomically(spark):
    """The matched right row attaches as ONE struct: a NULL payload
    VALUE in the matched row must come through as NULL — per-column
    ignorenulls merges would pull that column from an OLDER row
    (mixed-row result no ASOF JOIN produces; r5 review). Exercises both
    directions."""
    from crypto_near_real_time_data_ingestion_spark.operators.asof import asof_join

    left = _mini_events(spark, [(1, 1, "x", _t(10))]).select(
        "event_id", "user_id", "ts"
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            [(1, _t(1), "old"), (1, _t(5), None)],
            columns=["user_id", "rts", "tag"],
        )
    )
    got = asof_join(
        left, right, keys=["user_id"], left_time="ts", right_time="rts",
        payload=["tag"],
    ).first()
    assert got["asof_rts"] == _t(5)
    assert got["asof_tag"] is None  # NOT "old"

    fwd = funnel.asof_join_forward(
        left,
        spark.createDataFrame(
            pd.DataFrame(
                [(1, _t(20), None), (1, _t(30), "late")],
                columns=["user_id", "rts", "tag"],
            )
        ),
        keys=["user_id"], left_time="ts", right_time="rts", payload=["tag"],
    ).first()
    assert fwd["next_rts"] == _t(20)
    assert fwd["next_tag"] is None  # NOT "late"
