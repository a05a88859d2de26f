"""Streaming CEP run detection: maximal runs of ≥ k consecutive
same-role turns (the ``R{k,}`` pattern), per conversation.

Batch twin: ``plans/patterns.role_runs`` (gap-and-island) — this
operator answers the SAME DuckDB oracle after a drain. The streaming
form rides the watermark-ordered emission discipline of
``streaming/stateful.py``: arriving turns buffer in keyed state; once
the watermark passes a turn's event time it is fed — in strict
(ts, turn_idx) order — into the run accumulator, so late arrivals
within the watermark land in their correct sequence position BEFORE
pattern matching, and a run is emitted exactly once, when it is
DEFINITELY closed:

  * a watermark-ordered turn of a different role arrives (mid-stream
    closure), or
  * the conversation evicts (event-time timeout far past last
    activity) and the still-open run flushes.

State per key: the not-yet-watermarked turn buffer (bounded by the
watermark horizon) + the open run's 6 scalars + the emitted-turn dedup
set — O(horizon), not O(stream). Exact dedup happens in-state (Spark
disallows a second stateful operator upstream of
``applyInPandasWithState`` in one chain).

This is the MATCH_RECOGNIZE-style pattern operator the north rule's
"CEP" asks for, expressed as keyed state + event-time timers rather
than an NFA — for fixed patterns like ``R{k,}`` the accumulator IS the
(two-state) automaton.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CLOSE_GAP_S = 3600  # evict (and flush the open run) once wm is this far past

RUNS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("run_start_turn", T.IntegerType()),
        T.StructField("run_end_turn", T.IntegerType()),
        T.StructField("run_len", T.LongType()),
        T.StructField("run_start_ts", T.TimestampType()),
        T.StructField("run_end_ts", T.TimestampType()),
    ]
)

RUNS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buf_turn_idx", T.ArrayType(T.IntegerType())),
        T.StructField("buf_ts_us", T.ArrayType(T.LongType())),
        T.StructField("buf_role", T.ArrayType(T.StringType())),
        T.StructField("emitted_turn_idx", T.ArrayType(T.IntegerType())),
        # open run accumulator (role '' == none)
        T.StructField("run_role", T.StringType()),
        T.StructField("run_start_turn", T.IntegerType()),
        T.StructField("run_end_turn", T.IntegerType()),
        T.StructField("run_len", T.LongType()),
        T.StructField("run_start_us", T.LongType()),
        T.StructField("run_end_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

_EMPTY = ([], [], [], [], "", -1, -1, 0, -1, -1, -1)


def _runs_step(
    conv_id: str,
    pdf_iter: Iterator[pd.DataFrame],
    st: tuple,
    wm_us: int,
    target_role: str,
    min_run: int,
) -> tuple[list[tuple], tuple | None, int | None]:
    """Pure ingest+match core (same contract as ``stateful._step``):
    returns (closed_runs, new_state | None-to-evict, timer_ms | None)."""
    (
        buf_ti, buf_ts, buf_role, emitted_ti,
        r_role, r_start, r_end, r_len, r_start_us, r_end_us, last_ts,
    ) = st
    buf_ti, buf_ts, buf_role = list(buf_ti), list(buf_ts), list(buf_role)
    emitted_set = set(emitted_ti)

    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        ti = pdf["turn_idx"].to_numpy()
        ts = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        role = pdf["role"].to_numpy()
        buffered = set(buf_ti)
        for i in range(len(ti)):
            t = int(ti[i])
            if t in emitted_set or t in buffered:
                continue
            buffered.add(t)
            buf_ti.append(t)
            buf_ts.append(int(ts[i]))
            buf_role.append(str(role[i]))

    out: list[tuple] = []

    def close_run() -> None:
        if r_role == target_role and r_len >= min_run:
            out.append((conv_id, r_start, r_end, r_len, r_start_us, r_end_us))

    if buf_ti:
        order = np.lexsort((np.array(buf_ti), np.array(buf_ts)))
        keep_ti, keep_ts, keep_role = [], [], []
        for j in order:
            t_us = buf_ts[j]
            if t_us > wm_us:
                keep_ti.append(buf_ti[j])
                keep_ts.append(buf_ts[j])
                keep_role.append(buf_role[j])
                continue
            role = buf_role[j]
            if role == r_role:
                r_end, r_len, r_end_us = buf_ti[j], r_len + 1, t_us
            else:
                close_run()  # definitively closed: a later-ordered turn broke it
                r_role, r_len = role, 1
                r_start = r_end = buf_ti[j]
                r_start_us = r_end_us = t_us
            last_ts = t_us
            emitted_set.add(buf_ti[j])
        buf_ti, buf_ts, buf_role = keep_ti, keep_ts, keep_role

    if buf_ti:
        new_state = (
            buf_ti, buf_ts, buf_role, sorted(emitted_set),
            r_role, r_start, r_end, r_len, r_start_us, r_end_us, last_ts,
        )
        timer = max(min(buf_ts) // 1000 + 1, wm_us // 1000 + 1)
        return out, new_state, timer
    if last_ts >= 0:
        if wm_us > last_ts + CLOSE_GAP_S * 1_000_000:
            close_run()  # conversation over: flush the open run, evict
            return out, None, None
        new_state = (
            [], [], [], sorted(emitted_set),
            r_role, r_start, r_end, r_len, r_start_us, r_end_us, last_ts,
        )
        timer = max(last_ts // 1000 + CLOSE_GAP_S * 1000, wm_us // 1000 + 1)
        return out, new_state, timer
    return out, None, None


def _rows_to_pdf(rows: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=[f.name for f in RUNS_OUTPUT_SCHEMA.fields])
    out["run_start_ts"] = pd.to_datetime(out["run_start_ts"], unit="us")
    out["run_end_ts"] = pd.to_datetime(out["run_end_ts"], unit="us")
    return out


def role_runs_stream(
    silver_stream: DataFrame, role: str = "user", min_run: int = 2
) -> DataFrame:
    """Apply the streaming run detector to a cleansed, watermarked stream
    (NOT deduped upstream — dedup happens in-state)."""

    def fn(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        st = state.get if state.exists else _EMPTY
        wm_us = state.getCurrentWatermarkMs() * 1000
        out, new_state, timer = _runs_step(
            conv_id, pdf_iter, st, wm_us, role, min_run
        )
        if new_state is not None:
            state.update(new_state)
            state.setTimeoutTimestamp(timer)
        elif state.exists:
            state.remove()
        if out:
            yield _rows_to_pdf(out)

    return silver_stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=RUNS_OUTPUT_SCHEMA,
        stateStructType=RUNS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
