"""Property-based tests (hypothesis): operator semantics vs plain-Python
reference implementations on randomized tiny frames.

Spark-session-per-example is too slow, so each property batches the
randomized input through ONE Spark job and compares against a pure-pandas
model of the semantics."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crypto_near_real_time_data_ingestion_spark.operators.dedup import dedup_latest_wins
from crypto_near_real_time_data_ingestion_spark.operators.sessionize import (
    sessionize_batch,
)

BASE = dt.datetime(2025, 3, 1)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # conv_id
        st.integers(min_value=0, max_value=5),      # turn_idx
        st.integers(min_value=0, max_value=7200),   # ts offset seconds
        st.booleans(),                              # has tool
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows_strategy)
def test_dedup_latest_wins_property(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "off", "tool"])
    pdf["ts"] = pdf["off"].map(lambda s: BASE + dt.timedelta(seconds=int(s)))
    pdf["event_id"] = range(len(pdf))
    df = spark.createDataFrame(pdf[["conv_id", "turn_idx", "ts", "event_id"]])

    got = (
        dedup_latest_wins(df, ["conv_id", "turn_idx"], "ts", tiebreakers=["event_id"])
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # model: keep the row with max (ts, event_id) per key
    model = (
        pdf.sort_values(["ts", "event_id"])
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()[["conv_id", "turn_idx", "ts", "event_id"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "ts", "event_id"]].astype({"event_id": "int64"}),
        model.astype({"event_id": "int64"}),
        check_dtype=False,
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows_strategy)
def test_sessionize_property(spark, rows):
    # unique (conv, turn) with monotone ts per conv, like silver output
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "off", "tool"])
    pdf = pdf.drop_duplicates(["conv_id", "turn_idx"]).copy()
    pdf = pdf.sort_values(["conv_id", "off", "turn_idx"]).reset_index(drop=True)
    pdf["ts"] = pdf["off"].map(lambda s: BASE + dt.timedelta(seconds=int(s)))
    pdf["role"] = "user"
    pdf["tool"] = pdf["tool"].map(lambda b: "t" if b else None)
    df = spark.createDataFrame(pdf[["conv_id", "turn_idx", "role", "tool", "ts"]])

    got = sessionize_batch(df, gap_s=1800).toPandas()

    # model: gap-and-island per conv on (ts, turn_idx) order
    sessions = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"])
        sid, start, last, n, ntool = 0, None, None, 0, 0
        for _, r in g.iterrows():
            if start is None or (r["ts"] - last).total_seconds() >= 1800:
                if start is not None:
                    sessions.append((conv, sid, start, last, n, ntool))
                sid += 1
                start, n, ntool = r["ts"], 0, 0
            last = r["ts"]
            n += 1
            ntool += 1 if r["tool"] else 0
        sessions.append((conv, sid, start, last, n, ntool))
    model = pd.DataFrame(
        sessions,
        columns=["conv_id", "session_id", "session_start", "session_end", "n_turns", "n_tool_calls"],
    )
    key = ["conv_id", "session_id"]
    got = got.sort_values(key).reset_index(drop=True)
    model = model.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["conv_id", "session_id", "session_start", "session_end", "n_turns", "n_tool_calls"]],
        model,
        check_dtype=False,
    )
