"""Vectorized per-conversation rolling features via applyInPandas.

Numerically IDENTICAL to ``plans/gold_features.conv_features`` (the pure
Catalyst-window formulation, kept as the oracle/reference), but computed
in one Arrow-batched numpy pass per conversation:

  * Catalyst evaluates the expanding `percentile` window by re-sorting
    the aggregation buffer at every row → O(n² log n) per key; here the
    gap array is maintained incrementally sorted (one `np.searchsorted`
    insert per row) → O(n²) element moves but numpy-memcpy fast, ~6×
    faster end-to-end at sf0.1 and far flatter for hot conversations.
  * Interpolation runs on integer microseconds with the weighted-sum
    form (hi-pos)*a + (pos-lo)*b — the exact arithmetic Spark
    `percentile` / DuckDB `quantile_cont` use — so results are
    bit-identical to both (see gold_features.py notes).

This is the north-star shape: rolling per-entity features as a
vectorized pandas UDF over keyed groups, the batch twin of
``streaming/stateful.conv_features_stream``.

Scale: one shuffle on conv_id (applyInPandas requires clustering by the
key); state per group is O(turns-per-conversation). Hot conversations
are bounded by conversation length, not stream length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GAP_S_DEFAULT = 1800

FEATURES_SCHEMA = T.StructType(
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
        T.StructField("session_end", T.TimestampType()),
    ]
)

_PS = (0.5, 0.95, 0.99)


def percentiles_from_sorted(sorted_buf: np.ndarray, m: int) -> tuple[float, ...]:
    """(p50, p95, p99) of the first ``m`` elements of an already-sorted
    microsecond buffer, divided to seconds once at the end. Weighted-sum
    interpolation (hi-pos)*a + (pos-lo)*b — the exact arithmetic Spark
    `percentile` / DuckDB `quantile_cont` use, bit-identical to both
    (a + d*(b-a) differs in the last ULP). Shared by the batch
    applyInPandas twin AND the streaming stateful operator (which keeps
    its gap array sorted in state and inserts incrementally)."""
    out = []
    for p in _PS:
        pos = p * (m - 1)
        lo = int(np.floor(pos))
        hi = int(np.ceil(pos))
        v = (
            sorted_buf[lo]
            if lo == hi
            else (hi - pos) * sorted_buf[lo] + (pos - lo) * sorted_buf[hi]
        )
        out.append(v / 1e6)
    return tuple(out)


def sorted_insert(sorted_buf: np.ndarray, m: int, g: float) -> int:
    """Insert ``g`` into the sorted prefix ``sorted_buf[:m]`` (the buffer
    must have spare capacity); returns the new prefix length. One
    ``searchsorted`` + one memmove — the O(log n + n-move) incremental
    step both rolling twins share (vs re-sorting per row: O(n log n))."""
    j = np.searchsorted(sorted_buf[:m], g)
    sorted_buf[j + 1 : m + 1] = sorted_buf[j:m]
    sorted_buf[j] = g
    return m + 1


def _expanding_percentiles(gaps_us: np.ndarray) -> np.ndarray:
    """Row-wise expanding percentiles of the gap sequence (first row has no
    gap → NaN row). Returns (n, 3). Maintains an incrementally sorted
    prefix; interpolation = (hi-pos)*a + (pos-lo)*b — the exact
    weighted-sum arithmetic Spark `percentile` / DuckDB `quantile_cont`
    use, bit-identical to both (a + d*(b-a) differs in the last ULP)."""
    n = len(gaps_us)
    out = np.full((n, len(_PS)), np.nan)
    sorted_buf = np.empty(n, dtype=np.float64)
    m = 0
    for i in range(n):
        g = gaps_us[i]
        if not np.isnan(g):
            m = sorted_insert(sorted_buf, m, g)
        if m > 0:
            out[i] = percentiles_from_sorted(sorted_buf, m)
    return out


def _conv_features_pdf(pdf: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    n = len(pdf)
    ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    turn_idx = pdf["turn_idx"].to_numpy()
    has_tool = pdf["tool"].notna().to_numpy()

    gaps = np.empty(n)
    gaps[0] = np.nan
    gaps[1:] = (ts_us[1:] - ts_us[:-1]).astype(np.float64)

    counts = np.arange(1, n + 1, dtype=np.int64)
    pct = _expanding_percentiles(gaps)

    # rolling 10-minute turn count over RANGE frame (peers included)
    lo = np.searchsorted(ts_us, ts_us - 600_000_000, side="left")
    hi = np.searchsorted(ts_us, ts_us, side="right")
    rolling = (hi - lo).astype(np.int64)

    new_sess = np.zeros(n, dtype=np.int64)
    new_sess[0] = 1
    new_sess[1:] = (gaps[1:] >= gap_s * 1e6).astype(np.int64)
    session_id = np.cumsum(new_sess).astype(np.int32)
    # per-session bounds broadcast back to rows
    starts = pd.Series(ts_us).groupby(session_id).transform("min").to_numpy()
    ends = pd.Series(ts_us).groupby(session_id).transform("max").to_numpy()

    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"],
            "turn_idx": turn_idx.astype("int32"),
            "as_of_ts": pd.to_datetime(ts_us, unit="us"),
            "turn_count": counts,
            "max_turn_idx": np.maximum.accumulate(turn_idx).astype("int32"),
            "tool_call_rate": np.cumsum(has_tool.astype(np.int64)) / counts,
            "inter_turn_latency_p50": pct[:, 0],
            "inter_turn_latency_p95": pct[:, 1],
            "inter_turn_latency_p99": pct[:, 2],
            "rolling_turns_10m": rolling,
            "session_id": session_id,
            "session_start": pd.to_datetime(starts, unit="us"),
            "session_end": pd.to_datetime(ends, unit="us"),
        }
    )


def conv_features_vectorized(silver: DataFrame, gap_s: int = GAP_S_DEFAULT) -> DataFrame:
    """Arrow-vectorized twin of ``plans.gold_features.conv_features``."""
    return silver.select("conv_id", "turn_idx", "tool", "ts").groupBy(
        "conv_id"
    ).applyInPandas(
        lambda pdf: _conv_features_pdf(pdf, gap_s), schema=FEATURES_SCHEMA
    )
