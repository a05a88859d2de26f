"""Property tests for the pure stateful-operator cores.

The streaming as-of join and the CEP run detector are driven end-to-end
by the e2e suite over one fixed corpus; these tests pin their SEMANTICS
under hypothesis-generated adversarial inputs — arbitrary arrival
orders, batch partitions, watermark schedules, timestamp ties, and
duplicate deliveries — against brute-force reference implementations.

The generated schedules respect the Spark watermark contract the
operators are written against: a row never arrives after the watermark
has passed its event time (Spark's stateful machinery guarantees this
for the micro-batches the functions see; within-watermark LATE arrival,
i.e. out of event-time order, is generated freely).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from crypto_near_real_time_data_ingestion_spark.streaming.stateful_asof import (
    _EMPTY as ASOF_EMPTY,
)
from crypto_near_real_time_data_ingestion_spark.streaming.stateful_asof import (
    CLOSE_GAP_S,
    _asof_step,
)
from crypto_near_real_time_data_ingestion_spark.streaming.stateful import (
    _EMPTY as FEAT_EMPTY,
)
from crypto_near_real_time_data_ingestion_spark.streaming.stateful import _step
from crypto_near_real_time_data_ingestion_spark.streaming.stateful_runs import (
    _EMPTY as RUNS_EMPTY,
)
from crypto_near_real_time_data_ingestion_spark.streaming.stateful_runs import (
    _runs_step,
)

US = 1_000_000
FAR = 10**15  # watermark "infinity": flushes every buffer and eviction timer


# rows: (turn_idx, ts_us, role, tool) — ts drawn from a tiny set to force
# same-timestamp groups; tool non-empty on a subset of assistant turns
@st.composite
def _turn_history(draw):
    n = draw(st.integers(min_value=1, max_value=28))
    rows = []
    for ti in range(n):
        ts = draw(st.sampled_from([1, 2, 3, 5, 8, 13])) * US
        role = draw(st.sampled_from(["user", "assistant", "tool"]))
        tool = draw(st.sampled_from(["", "", "search", "calc"]))
        rows.append((ti, ts, role, tool))
    # arrival order: any permutation (event-time disorder is the point)
    order = draw(st.permutations(range(n)))
    # duplicate deliveries of a few rows (exact dupes, like a source replay)
    dup_of = draw(
        st.lists(st.integers(min_value=0, max_value=n - 1), max_size=4)
    )
    arrival = [rows[i] for i in order] + [rows[i] for i in dup_of]
    # partition the arrival sequence into 1-4 batches
    n_batches = draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(arrival)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(arrival)]:
        batches.append(arrival[prev:c])
        prev = c
    return rows, batches


def _wm_schedule(batches):
    """Monotonic watermarks honoring BOTH halves of Spark's contract:
    after batch i the watermark stays AT OR below every event time
    still to arrive — Spark drops late rows only when event-time is
    STRICTLY below the watermark, so a still-to-arrive row with
    ts == wm is legal and the schedule deliberately produces it
    (wm = min(future), the boundary every kernel must treat as
    pending; the round-5 watermark-tie convention) — AND it never
    exceeds the max event time observed so far: Spark computes the
    watermark as max(observed event time) - delay with delay >= 0, so
    a schedule that jumps past everything seen is unreachable. (The
    unreachable jump matters: it can cross a key's eviction horizon
    while rows for that key are still in flight, manufacturing a
    "revived conversation" no real Spark run could produce.)"""
    wms, wm_prev, seen_max = [], -1, -1
    for i in range(len(batches)):
        seen_max = max([seen_max] + [ts for (_, ts, _, _) in batches[i]])
        future = [ts for b in batches[i + 1 :] for (_, ts, _, _) in b]
        wm = min(min(future), seen_max) if future else FAR
        wm = max(wm, wm_prev)  # watermarks never regress
        wms.append(wm)
        wm_prev = wm
    return wms


def _pdf(batch):
    d = pd.DataFrame(batch, columns=["turn_idx", "ts", "role", "tool"])
    d["tool"] = d["tool"].replace("", None)
    d["ts"] = pd.to_datetime(d["ts"], unit="us")
    return d


def _drive_asof(batches):
    # None mirrors "no state row exists": Spark then skips the group on
    # an input-less micro-batch and hands the fn _EMPTY otherwise.
    st_ = None
    out = []
    for batch, wm in zip(batches, _wm_schedule(batches)):
        if st_ is None and not batch:
            continue
        o, st_, _ = _asof_step(
            "c", iter([_pdf(batch)]), st_ if st_ is not None else ASOF_EMPTY, wm
        )
        if o is not None:
            out.append(o)
    if st_ is not None:  # final flush + eviction
        o, st_, _ = _asof_step("c", iter([]), st_, FAR + 2 * CLOSE_GAP_S * US)
        if o is not None:
            out.append(o)
        assert st_ is None, "state must evict once the watermark passes"
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _brute_asof(rows):
    """Reference: each turn gets the lexicographically-latest (ts, ti)
    tool row with ts <= its own ts (same-ts tools visible, max ti wins)."""
    want = []
    for ti, ts, role, _ in rows:
        cand = [(t, i) for (i, t, _, tl) in rows if tl and t <= ts]
        if cand:
            bt, bi = max(cand)
            tool = next(tl for (i, t, _, tl) in rows if i == bi and t == bt)
            want.append((ti, ts, role, bt, bi, tool))
        else:
            want.append((ti, ts, role, None, None, None))
    return sorted(want)


@settings(max_examples=120, deadline=None)
@given(_turn_history())
def test_asof_core_matches_brute_force(case):
    rows, batches = case
    got_pdf = _drive_asof(batches)
    got = sorted(
        (
            int(r.turn_idx),
            int(r.ts.value // 1000),  # ns → µs
            r.role,
            None if pd.isna(r.asof_ts) else int(r.asof_ts.value // 1000),
            None if r.asof_tool_turn_idx is None else int(r.asof_tool_turn_idx),
            r.asof_tool_used,
        )
        for r in got_pdf.itertuples()
    )
    assert got == _brute_asof(rows)
    # exactly-once: every turn emitted exactly once despite dup deliveries
    assert len(got) == len(rows)


def _drive_runs(batches, target="user", min_run=2):
    st_ = None
    out = []
    for batch, wm in zip(batches, _wm_schedule(batches)):
        if st_ is None and not batch:
            continue
        o, st_, _ = _runs_step(
            "c",
            iter([_pdf(batch)]),
            st_ if st_ is not None else RUNS_EMPTY,
            wm,
            target,
            min_run,
        )
        out.extend(o)
    if st_ is not None:
        o, st_, _ = _runs_step(
            "c", iter([]), st_, FAR + 2 * CLOSE_GAP_S * US, target, min_run
        )
        out.extend(o)
        assert st_ is None
    return sorted(out)


def _brute_runs(rows, target="user", min_run=2):
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))  # (ts, ti)
    runs, cur = [], []
    for r in ordered:
        if cur and r[2] == cur[-1][2]:
            cur.append(r)
        else:
            if cur:
                runs.append(cur)
            cur = [r]
    if cur:
        runs.append(cur)
    return sorted(
        ("c", seg[0][0], seg[-1][0], len(seg), seg[0][1], seg[-1][1])
        for seg in runs
        if seg[0][2] == target and len(seg) >= min_run
    )


@settings(max_examples=120, deadline=None)
@given(_turn_history())
def test_runs_core_matches_brute_force(case):
    rows, batches = case
    assert _drive_runs(batches) == _brute_runs(rows)


# --- conv-features core (stateful._step): scale timestamps to minutes so
# the 10-minute rolling window actually trims, and use a 3-minute session
# gap so sessionization actually splits, under the same adversarial
# arrival schedules.

FEAT_GAP_S = 180
MIN_SCALE = 60  # seconds → minutes


def _scaled(case):
    rows, batches = case
    s = lambda r: (r[0], r[1] * MIN_SCALE, r[2], r[3])  # noqa: E731
    return [s(r) for r in rows], [[s(r) for r in b] for b in batches]


def _nn(v):
    return None if (isinstance(v, float) and np.isnan(v)) else v


def _drive_features(batches):
    st_ = None
    rows_out = []
    for batch, wm in zip(batches, _wm_schedule(batches)):
        if st_ is None and not batch:
            continue
        o, st_, _ = _step(
            "c",
            iter([_pdf(batch)]),
            st_ if st_ is not None else FEAT_EMPTY,
            wm,
            FEAT_GAP_S,
        )
        rows_out.extend(o)
    if st_ is not None:
        o, st_, _ = _step("c", iter([]), st_, FAR, FEAT_GAP_S)
        rows_out.extend(o)
        assert st_ is None, "state must evict once the watermark passes"
    return sorted(
        (ti, ts, c, mti, rate, _nn(p50), _nn(p95), _nn(p99), roll, sid, ss)
        for (_c, ti, ts, c, mti, rate, p50, p95, p99, roll, sid, ss) in rows_out
    )


def _brute_features(rows):
    """Reference: causal expanding features over the (ts, turn_idx)-ordered
    unique turns; percentiles re-derived by a FULL SORT each row (checks
    the core's incremental sorted-insert path), same weighted-sum
    interpolation arithmetic as Spark `percentile`."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    out, gaps, ets = [], [], []
    tools, max_ti, last, sid, sstart = 0, -1, None, 0, None
    for k, (ti, ts, _role, tool) in enumerate(ordered, 1):
        if last is None:
            sid, sstart = 1, ts
        else:
            g = float(ts - last)
            gaps.append(g)
            if g >= FEAT_GAP_S * 1e6:
                sid += 1
                sstart = ts
        tools += 1 if tool else 0
        max_ti = max(max_ti, ti)
        last = ts
        ets.append(ts)
        roll = sum(1 for t in ets if t >= ts - 600_000_000)
        if gaps:
            sg = sorted(gaps)
            ps = []
            for p in (0.50, 0.95, 0.99):
                pos = p * (len(sg) - 1)
                lo, hi = int(np.floor(pos)), int(np.ceil(pos))
                v = sg[lo] if lo == hi else (hi - pos) * sg[lo] + (pos - lo) * sg[hi]
                ps.append(v / 1e6)
        else:
            ps = [None, None, None]
        out.append(
            (ti, ts, k, max_ti, tools / k, ps[0], ps[1], ps[2], roll, sid, sstart)
        )
    return sorted(out)


@settings(max_examples=120, deadline=None)
@given(_turn_history())
def test_features_core_matches_brute_force(case):
    rows, batches = _scaled(case)
    assert _drive_features(batches) == _brute_features(rows)
