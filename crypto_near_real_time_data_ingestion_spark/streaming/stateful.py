"""Per-conversation stateful rolling features (applyInPandasWithState).

The north-star custom operator: per-`conv_id` keyed state holding a
sorted turn buffer + running aggregates, with watermark-driven emission
and event-time-timeout eviction. Streaming counterpart of the batch
``plans/gold_features.conv_features`` plan (its equivalence oracle) for
the *causal* feature columns — everything computable from turns at or
before the current one:

  turn_count, max_turn_idx, tool_call_rate,
  inter_turn_latency_p50/p95/p99 (expanding exact percentiles),
  rolling_turns_10m, session_id, session_start

(`session_end` is future-looking in the batch plan — the final end of the
session — so it is not emitted here.)

Emission discipline: arriving turns are buffered in state; a turn is
emitted only once the watermark has passed its event time, in strict
(ts, turn_idx) order — so late arrivals within the watermark slot into
their correct position BEFORE feature computation, and the emitted
features are byte-equal to the batch plan's. Duplicates are dropped
against the buffered + emitted turn_idx set (exact dedup inside the
operator, because Spark does not allow a second stateful operator
upstream of applyInPandasWithState in the same chain).

State size is O(turns per conversation) — the gap array backs exact
percentiles. Conversations are length-bounded in this domain; for
unbounded keys swap the array for a mergeable quantile sketch (KLL /
t-digest) at the cost of exactness, and the rest of the state stays O(1).

Eviction contract: a conversation's aggregates are dropped once the
watermark passes ``last activity + 2*gap_s`` (state must be bounded —
keys are never "done" in an endless stream). A turn arriving after that
horizon (possible: the GLOBAL watermark is driven by other keys, and an
above-watermark event time can sit arbitrarily far ahead of it) REVIVES
the conversation with fresh lifetime aggregates — the same revival
semantics Spark's own ``session_window`` state has. Batch-plan
equivalence therefore holds for turns arriving within the eviction
horizon; the property test's watermark schedules
(``tests/test_stateful_cores.py::_wm_schedule``) span exactly the
schedules a real Spark watermark (max observed event time - delay) can
produce, under which the horizon cannot be crossed while a key's rows
are still in flight in the single-key case.
All computation inside the operator is numpy-vectorized over Arrow
batches (no per-row Python in the hot path).

Reference parity: this operator replaces the reference's per-entity
ordered window features (``gold_ml_training_job.py:57-109``, W5-W9)
with streaming keyed state; eviction mirrors watermark semantics the
reference approximates with daily batch boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_S_DEFAULT = 1800

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("as_of_ts", T.TimestampType()),
        T.StructField("turn_count", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("tool_call_rate", T.DoubleType()),
        T.StructField("inter_turn_latency_p50", T.DoubleType()),
        T.StructField("inter_turn_latency_p95", T.DoubleType()),
        T.StructField("inter_turn_latency_p99", T.DoubleType()),
        T.StructField("rolling_turns_10m", T.LongType()),
        T.StructField("session_id", T.IntegerType()),
        T.StructField("session_start", T.TimestampType()),
    ]
)

# state: buffered (unemitted) turns + running aggregates over emitted turns
STATE_SCHEMA = T.StructType(
    [
        T.StructField("buf_turn_idx", T.ArrayType(T.IntegerType())),
        T.StructField("buf_ts_us", T.ArrayType(T.LongType())),
        T.StructField("buf_tool", T.ArrayType(T.BooleanType())),
        T.StructField("emitted_turn_idx", T.ArrayType(T.IntegerType())),
        T.StructField("gaps_us", T.ArrayType(T.DoubleType())),  # kept SORTED
        T.StructField("recent_ts_us", T.ArrayType(T.LongType())),
        T.StructField("emitted_count", T.LongType()),
        T.StructField("emitted_tool", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_id", T.IntegerType()),
        T.StructField("session_start_us", T.LongType()),
    ]
)

_EMPTY = ([], [], [], [], [], [], 0, 0, -1, -1, 0, -1)


# percentile interpolation + incremental sorted insert are SHARED with
# the batch applyInPandas twin (operators/rolling.py) — the state's gap
# array is kept sorted, so each emission costs one searchsorted insert
# (O(log n + move)) instead of a full re-sort (O(n log n) per row).
# BIT-identical to Spark `percentile` / DuckDB `quantile_cont` — see
# percentiles_from_sorted notes.
from ..operators.rolling import percentiles_from_sorted, sorted_insert  # noqa: E402


def _step(
    conv_id: str,
    pdf_iter: Iterator[pd.DataFrame],
    st: tuple,
    wm_us: int,
    gap_s: int,
) -> tuple[list[tuple], tuple | None, int | None]:
    """Pure ingest+emit core shared by both stateful backends
    (``applyInPandasWithState`` and ``transformWithStateInPandas``).

    Takes the 12-field state tuple (layout = ``STATE_SCHEMA``), ingests
    the batch's rows (exact dedup vs buffered+emitted), emits every
    buffered turn whose event time the watermark has STRICTLY passed —
    in strict (ts, turn_idx) order — and returns
    ``(out_rows, new_state | None-to-evict, timer_ms | None)``.
    Strictly: Spark drops late rows only when event-time < watermark,
    so a ``ts == wm`` row may still arrive and its tied peers must
    stay pending or the ordered running aggregates (gaps, sessions)
    would fold the tie out of order (the stateful_funnel boundary
    convention, applied to every sibling kernel round 5)."""
    (
        buf_ti, buf_ts, buf_tool, emitted_ti, gaps, recent,
        e_count, e_tool, max_ti, last_ts, sess_id, sess_start,
    ) = st
    buf_ti, buf_ts, buf_tool = list(buf_ti), list(buf_ts), list(buf_tool)
    emitted_set = set(emitted_ti)
    gaps = list(gaps)
    recent = list(recent)
    rhead = 0  # advancing window head — recent[] stays append-only per step

    # --- ingest new rows (exact dedup vs buffered+emitted), vectorized:
    # first batch occurrence per turn_idx (np.unique return_index), then
    # one isin against the already-known set — no per-row Python loop.
    # The emitted part of `known` is constant across this step's chunks,
    # so it converts to ndarray ONCE; only the growing buffered part is
    # re-appended per chunk.
    emitted_arr = np.fromiter(emitted_set, dtype=np.int64, count=len(emitted_set))
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        ti = pdf["turn_idx"].to_numpy()
        ts = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        tool = pdf["tool"].notna().to_numpy()
        known = emitted_arr
        if buf_ti:
            known = np.concatenate([known, np.asarray(buf_ti, dtype=np.int64)])
        uniq, first_idx = np.unique(ti, return_index=True)
        sel = first_idx[~np.isin(uniq, known)]
        buf_ti.extend(np.asarray(ti[sel]).tolist())
        buf_ts.extend(np.asarray(ts[sel]).tolist())
        buf_tool.extend(np.asarray(tool[sel]).tolist())

    # --- emit buffered turns whose event time < watermark, in order
    # (ts == wm is still-arrivable — see the docstring)
    out_rows: list[tuple] = []
    if buf_ti:
        order = np.lexsort((np.array(buf_ti), np.array(buf_ts)))
        # sorted gap buffer with capacity for this step's emissions: one
        # searchsorted insert per emitted turn (state keeps it sorted)
        gbuf = np.empty(len(gaps) + len(order), dtype=np.float64)
        m = len(gaps)
        gbuf[:m] = gaps
        keep_ti, keep_ts, keep_tool = [], [], []
        for j in order:
            t_us = buf_ts[j]
            if t_us >= wm_us:
                keep_ti.append(buf_ti[j])
                keep_ts.append(buf_ts[j])
                keep_tool.append(buf_tool[j])
                continue
            # ---- emit this turn
            if last_ts >= 0:
                gap_us = float(t_us - last_ts)
                m = sorted_insert(gbuf, m, gap_us)
                if gap_us >= gap_s * 1e6:
                    sess_id += 1
                    sess_start = t_us
            else:
                sess_id = 1
                sess_start = t_us
            e_count += 1
            e_tool += 1 if buf_tool[j] else 0
            max_ti = max(max_ti, buf_ti[j])
            last_ts = t_us
            recent.append(t_us)
            lo = t_us - 600_000_000
            while recent[rhead] < lo:  # emission order ⇒ recent is sorted
                rhead += 1
            p50, p95, p99 = (
                percentiles_from_sorted(gbuf, m) if m else (np.nan,) * 3
            )
            emitted_set.add(buf_ti[j])
            out_rows.append(
                (
                    conv_id,
                    buf_ti[j],
                    t_us,
                    e_count,
                    max_ti,
                    e_tool / e_count,
                    p50,
                    p95,
                    p99,
                    len(recent) - rhead,
                    sess_id,
                    sess_start,
                )
            )
        buf_ti, buf_ts, buf_tool = keep_ti, keep_ts, keep_tool
        gaps = gbuf[:m].tolist()
    recent = recent[rhead:]

    # --- persistence directive
    if buf_ti:
        new_state = (
            buf_ti, buf_ts, buf_tool, sorted(emitted_set), gaps, recent,
            e_count, e_tool, max_ti, last_ts, sess_id, sess_start,
        )
        # re-arm: wake when the watermark passes the earliest buffered turn
        timer = max(min(buf_ts) // 1000 + 1, wm_us // 1000 + 1)
        return out_rows, new_state, timer
    if e_count > 0:
        # nothing buffered: keep aggregates until the watermark is far past
        # the last activity, then evict (watermark-driven state eviction)
        if wm_us > last_ts + 2 * gap_s * 1_000_000:
            return out_rows, None, None
        new_state = (
            [], [], [], sorted(emitted_set), gaps, recent,
            e_count, e_tool, max_ti, last_ts, sess_id, sess_start,
        )
        timer = max(last_ts // 1000 + 2 * gap_s * 1000, wm_us // 1000 + 1)
        return out_rows, new_state, timer
    return out_rows, None, None


def _rows_to_pdf(out_rows: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])
    out["as_of_ts"] = pd.to_datetime(out["as_of_ts"], unit="us")
    out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
    return out


def _process_conv(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    st = state.get if state.exists else _EMPTY
    wm_us = state.getCurrentWatermarkMs() * 1000
    out_rows, new_state, timer = _step(conv_id, pdf_iter, st, wm_us, gap_s)

    if new_state is not None:
        state.update(new_state)
        state.setTimeoutTimestamp(timer)
    elif state.exists:
        state.remove()

    if out_rows:
        yield _rows_to_pdf(out_rows)


def conv_features_stream(
    silver_stream: DataFrame, gap_s: int = GAP_S_DEFAULT
) -> DataFrame:
    """Apply the stateful per-conversation feature operator to a cleansed,
    watermarked stream (NOT deduped upstream — dedup happens in-state)."""

    def fn(key, pdf_iter, state):
        return _process_conv(key, pdf_iter, state, gap_s)

    return silver_stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
