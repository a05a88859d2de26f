"""Vectorized per-conversation rolling features (secondary-sort mapInPandas).

Numerically IDENTICAL to ``plans/gold_features.conv_features`` (the pure
Catalyst-window formulation, kept as the oracle/reference), computed as
one Arrow pass with numpy segmentation:

  * ``repartition(conv_id)`` + ``sortWithinPartitions(conv_id, ts,
    turn_idx)`` + ``mapInPandas`` — hundreds of conversations per Arrow
    batch, each a numpy slice. The naive ``applyInPandas`` pays a
    per-group pandas/Arrow round trip (~2 ms), which DOMINATES on
    many-small-groups corpora (43.6 s vs ~4 s at sf0.1).
  * Catalyst evaluates the expanding `percentile` window by re-sorting
    the aggregation buffer at every row → O(n² log n) per key; here the
    gap array is maintained incrementally sorted (one `np.searchsorted`
    insert per row) — the same shared core the streaming stateful
    operator carries in its state.
  * Interpolation runs on integer microseconds with the weighted-sum
    form (hi-pos)*a + (pos-lo)*b — the exact arithmetic Spark
    `percentile` / DuckDB `quantile_cont` use — so results are
    bit-identical to both (see gold_features.py notes).

This is the north-star shape: rolling per-entity features as a
vectorized pandas UDF over keyed groups, the batch twin of
``streaming/stateful.conv_features_stream``.

Scale: one shuffle on conv_id; per-group transient state is
O(turns-per-conversation); a conversation split across Arrow batches is
carried over inside the partition iterator (secondary-sort pattern).
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


def _conv_feature_arrays(
    ts_us: np.ndarray, turn_idx: np.ndarray, has_tool: np.ndarray, gap_s: int
) -> dict[str, np.ndarray]:
    """Per-conversation feature arrays from (ts, turn_idx)-sorted inputs —
    the shared numpy core of both Arrow formulations."""
    n = len(ts_us)
    gaps = np.empty(n)
    gaps[0] = np.nan
    gaps[1:] = (ts_us[1:] - ts_us[:-1]).astype(np.float64)

    counts = np.arange(1, n + 1, dtype=np.int64)
    pct = _expanding_percentiles(gaps)

    # rolling 10-minute turn count over RANGE frame (peers included)
    lo = np.searchsorted(ts_us, ts_us - 600_000_000, side="left")
    hi = np.searchsorted(ts_us, ts_us, side="right")

    new_sess = np.zeros(n, dtype=np.int64)
    new_sess[0] = 1
    new_sess[1:] = (gaps[1:] >= gap_s * 1e6).astype(np.int64)
    session_id = np.cumsum(new_sess).astype(np.int32)
    # per-session bounds broadcast back to rows (segment min = first ts,
    # segment max = last ts — rows are ts-sorted)
    sess_first = np.flatnonzero(new_sess)
    sess_counts = np.diff(np.append(sess_first, n))
    starts = np.repeat(ts_us[sess_first], sess_counts)
    last_idx = np.append(sess_first[1:], n) - 1
    ends = np.repeat(ts_us[last_idx], sess_counts)

    return {
        "turn_idx": turn_idx.astype("int32"),
        "as_of_ts": ts_us,
        "turn_count": counts,
        "max_turn_idx": np.maximum.accumulate(turn_idx).astype("int32"),
        "tool_call_rate": np.cumsum(has_tool.astype(np.int64)) / counts,
        "inter_turn_latency_p50": pct[:, 0],
        "inter_turn_latency_p95": pct[:, 1],
        "inter_turn_latency_p99": pct[:, 2],
        "rolling_turns_10m": (hi - lo).astype(np.int64),
        "session_id": session_id,
        "session_start": starts,
        "session_end": ends,
    }


_TS_COLS = ("as_of_ts", "session_start", "session_end")


def conv_features_vectorized(silver: DataFrame, gap_s: int = GAP_S_DEFAULT) -> DataFrame:
    """Arrow-vectorized twin of ``plans.gold_features.conv_features``.

    Secondary-sort formulation: ``repartition(conv_id)`` +
    ``sortWithinPartitions(conv_id, ts, turn_idx)`` + ``mapInPandas``
    with numpy segmentation. One Arrow batch carries HUNDREDS of
    conversations, so the per-group cost is a numpy slice — unlike
    ``applyInPandas``, which pays a per-group pandas/Arrow round trip
    (~2 ms × 20k conversations ≈ 40 s at sf0.1 — the measured loser of
    round 1). Conversations spanning an Arrow batch boundary are carried
    over inside the partition iterator (classic secondary-sort pattern).
    Same single shuffle on conv_id; bit-identical output."""

    def fn(it):
        import pyarrow  # noqa: F401 — Arrow batches in, Arrow batches out

        pending: pd.DataFrame | None = None

        def emit(pdf: pd.DataFrame, flush: bool) -> pd.DataFrame | None:
            nonlocal pending
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if len(pdf) == 0:
                return None
            conv = pdf["conv_id"].to_numpy()
            # group boundaries within the (conv-sorted) batch
            change = np.flatnonzero(conv[1:] != conv[:-1]) + 1
            starts = np.concatenate(([0], change))
            if not flush:
                # hold back the (possibly incomplete) last conversation
                if len(starts) == 1:
                    pending = pdf
                    return None
                cut = starts[-1]
                pending = pdf.iloc[cut:].reset_index(drop=True)
                pdf = pdf.iloc[:cut]
                starts = starts[:-1]
                conv = conv[: cut]
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            turn_idx = pdf["turn_idx"].to_numpy()
            has_tool = pdf["tool"].notna().to_numpy()
            ends = np.append(starts[1:], len(pdf))
            cols: dict[str, list[np.ndarray]] = {}
            for s, e in zip(starts, ends):
                feats = _conv_feature_arrays(
                    ts_us[s:e], turn_idx[s:e], has_tool[s:e], gap_s
                )
                for k, v in feats.items():
                    cols.setdefault(k, []).append(v)
            out = pd.DataFrame({"conv_id": conv})
            for k, chunks in cols.items():
                v = np.concatenate(chunks)
                out[k] = pd.to_datetime(v, unit="us") if k in _TS_COLS else v
            return out

        for pdf in it:
            got = emit(pdf, flush=False)
            if got is not None and len(got):
                yield got
        last, pending = pending, None
        if last is not None and len(last):
            got = emit(last, flush=True)
            if got is not None and len(got):
                yield got

    return (
        silver.select("conv_id", "turn_idx", "tool", "ts")
        .repartition("conv_id")
        .sortWithinPartitions("conv_id", "ts", "turn_idx")
        .mapInPandas(fn, schema=FEATURES_SCHEMA)
    )
