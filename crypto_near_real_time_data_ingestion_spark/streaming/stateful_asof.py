"""Streaming as-of join: per-turn "latest tool call at or before me".

The batch ``operators/asof.turn_tool_asof`` (union-merge, one shuffle)
re-expressed as keyed streaming state — the TEMPORAL-join member of the
stateful-operator family (features = aggregates, runs = CEP, this =
as-of). Spark's native stream-stream join cannot express as-of ("latest
right ≤ t", an ordered, non-equi, last-wins match), so it rides the
watermark-ordered emission discipline of ``streaming/stateful.py``:

  * turns buffer in keyed state until the watermark passes their event
    time (late arrivals within the watermark slot into their correct
    position BEFORE matching);
  * emission walks (ts, turn_idx) order in TS GROUPS: all tool calls at
    a timestamp become visible before any turn at that timestamp emits,
    so a turn and a tool call sharing ``ts`` match (``<=`` semantics,
    max turn_idx wins the tie) — exactly the batch twin's union-merge
    ordering (right side sorts before left at equal time) and DuckDB's
    ``ASOF LEFT JOIN`` on the pre-uniqued right side;
  * the only cross-turn state the match needs is the LATEST tool call
    seen — three scalars, O(1), plus the watermark-horizon buffer and
    the emitted-turn dedup set (in-state exact dedup, since Spark
    disallows a second stateful operator upstream in the same chain).

State is O(watermark horizon) per conversation regardless of stream
length; eviction fires once the watermark is ``CLOSE_GAP_S`` past the
last activity (event-time timeout), like the run detector's.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CLOSE_GAP_S = 3600

ASOF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("role", T.StringType()),
        T.StructField("asof_ts", T.TimestampType()),
        T.StructField("asof_tool_turn_idx", T.IntegerType()),
        T.StructField("asof_tool_used", T.StringType()),
    ]
)

ASOF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buf_turn_idx", T.ArrayType(T.IntegerType())),
        T.StructField("buf_ts_us", T.ArrayType(T.LongType())),
        T.StructField("buf_role", T.ArrayType(T.StringType())),
        T.StructField("buf_tool", T.ArrayType(T.StringType())),  # '' = no tool
        T.StructField("emitted_turn_idx", T.ArrayType(T.IntegerType())),
        # latest tool call visible to future turns (us == -1 -> none yet)
        T.StructField("tool_ts_us", T.LongType()),
        T.StructField("tool_turn_idx", T.IntegerType()),
        T.StructField("tool_used", T.StringType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

_EMPTY = ([], [], [], [], [], -1, -1, "", -1)


def _asof_step(
    conv_id: str,
    pdf_iter: Iterator[pd.DataFrame],
    st: tuple,
    wm_us: int,
) -> tuple[list[tuple], tuple | None, int | None]:
    """Pure ingest+match core (same contract as ``stateful._step``)."""
    (
        buf_ti, buf_ts, buf_role, buf_tool, emitted_ti,
        tool_us, tool_ti, tool_used, last_ts,
    ) = st
    buf_ti, buf_ts = list(buf_ti), list(buf_ts)
    buf_role, buf_tool = list(buf_role), list(buf_tool)
    emitted_set = set(emitted_ti)

    # vectorized ingest (np.unique first-occurrence + isin vs known set)
    emitted_arr = np.fromiter(emitted_set, dtype=np.int64, count=len(emitted_set))
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        ti = pdf["turn_idx"].to_numpy()
        ts = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        role = pdf["role"].to_numpy()
        tool = pdf["tool"].fillna("").to_numpy()
        known = emitted_arr
        if buf_ti:
            known = np.concatenate([known, np.asarray(buf_ti, dtype=np.int64)])
        uniq, first_idx = np.unique(ti, return_index=True)
        sel = first_idx[~np.isin(uniq, known)]
        buf_ti.extend(np.asarray(ti[sel]).tolist())
        buf_ts.extend(np.asarray(ts[sel]).tolist())
        buf_role.extend(np.asarray(role[sel]).tolist())
        buf_tool.extend(np.asarray(tool[sel]).tolist())

    out: list[tuple] = []
    if buf_ti:
        order = np.lexsort((np.array(buf_ti), np.array(buf_ts)))
        keep = []
        i = 0
        n = len(order)
        while i < n:
            j = order[i]
            t_us = buf_ts[j]
            if t_us > wm_us:
                keep.append(j)
                i += 1
                continue
            # ts group [i, g): all emittable turns sharing this timestamp
            g = i
            while g < n and buf_ts[order[g]] == t_us:
                g += 1
            # 1) tool calls at this ts become visible first (max turn_idx
            #    wins the within-ts tie — matches the pre-uniqued right)
            for p in range(i, g):
                q = order[p]
                if buf_tool[q] and (t_us > tool_us or buf_ti[q] > tool_ti):
                    tool_us, tool_ti, tool_used = t_us, buf_ti[q], buf_tool[q]
            # 2) every turn at this ts emits against the updated latest
            for p in range(i, g):
                q = order[p]
                emitted_set.add(buf_ti[q])
                last_ts = t_us
                out.append(
                    (
                        conv_id,
                        buf_ti[q],
                        t_us,
                        buf_role[q],
                        tool_us if tool_us >= 0 else None,
                        tool_ti if tool_us >= 0 else None,
                        tool_used if tool_us >= 0 else None,
                    )
                )
            i = g
        buf_ti = [buf_ti[j] for j in keep]
        buf_ts = [buf_ts[j] for j in keep]
        buf_role = [buf_role[j] for j in keep]
        buf_tool = [buf_tool[j] for j in keep]

    if buf_ti:
        new_state = (
            buf_ti, buf_ts, buf_role, buf_tool, sorted(emitted_set),
            tool_us, tool_ti, tool_used, last_ts,
        )
        timer = max(min(buf_ts) // 1000 + 1, wm_us // 1000 + 1)
        return out, new_state, timer
    if last_ts >= 0:
        if wm_us > last_ts + CLOSE_GAP_S * 1_000_000:
            return out, None, None
        new_state = (
            [], [], [], [], sorted(emitted_set),
            tool_us, tool_ti, tool_used, last_ts,
        )
        timer = max(last_ts // 1000 + CLOSE_GAP_S * 1000, wm_us // 1000 + 1)
        return out, new_state, timer
    return out, None, None


def _rows_to_pdf(rows: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=[f.name for f in ASOF_OUTPUT_SCHEMA.fields])
    out["ts"] = pd.to_datetime(out["ts"], unit="us")
    out["asof_ts"] = pd.to_datetime(out["asof_ts"], unit="us")
    return out


def tool_asof_stream(silver_stream: DataFrame) -> DataFrame:
    """Apply the streaming as-of operator to a cleansed, watermarked
    stream (NOT deduped upstream — dedup happens in-state)."""

    def fn(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        st = state.get if state.exists else _EMPTY
        wm_us = state.getCurrentWatermarkMs() * 1000
        out, new_state, timer = _asof_step(conv_id, pdf_iter, st, wm_us)
        if new_state is not None:
            state.update(new_state)
            state.setTimeoutTimestamp(timer)
        elif state.exists:
            state.remove()
        if out:
            yield _rows_to_pdf(out)

    return silver_stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
