"""Hypothesis fuzz of the streaming funnel kernel (`_funnel_step`):
for ANY event set and ANY watermark-respecting batch schedule, the
emitted anchors must equal a brute-force python funnel — each anchor
exactly once, with the earliest-strictly-after-within-horizon chain.

This targets the stateful kernel directly (pure function, no Spark per
example), so hypothesis can hammer the hard parts: timestamp ties,
multi-step advances within one window, anchors spanning batch
boundaries, horizon-edge deaths, and batch-granularity invariance."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from crypto_near_real_time_data_ingestion_spark.streaming.stateful_funnel import (
    _EMPTY,
    _NULL_US,
    _funnel_step,
)

STEPS = ("a", "b", "c")
H = 5  # horizon in µs-units of the tiny integer timeline


def _brute_funnel(events):
    """Reference: per step-0 event, chain the earliest strictly-after
    match within H per step. events: list of (ts, eid, type)."""
    out = {}
    by_type = {
        s: sorted(ts for ts, _, ty in events if ty == s) for s in STEPS
    }
    for ts0, eid, ty in events:
        if ty != STEPS[0]:
            continue
        chain = [ts0]
        frontier = ts0
        for s in STEPS[1:]:
            nxt = next(
                (t for t in by_type[s] if frontier < t <= frontier + H), None
            )
            chain.append(nxt if nxt is not None else _NULL_US)
            if nxt is None:
                frontier = None
                break
            frontier = nxt
        while len(chain) < len(STEPS):
            chain.append(_NULL_US)
        out[eid] = tuple(chain)
    return out


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=25),  # ts
        st.sampled_from(["a", "b", "c", "x"]),  # type (x = noise)
    ),
    min_size=0,
    max_size=30,
).map(
    lambda rows: [(ts, i, ty) for i, (ts, ty) in enumerate(rows)]
)


@settings(max_examples=300, deadline=None)
@given(
    events=events_strategy,
    cuts=st.lists(st.integers(min_value=0, max_value=25), max_size=4),
)
def test_kernel_matches_brute_force_at_any_batching(events, cuts):
    """Feed the kernel the ts-ordered events split at arbitrary DISTINCT
    ts boundaries (the watermark contract the real source guarantees),
    with wm = max ts of each delivered batch; then a final flush. The
    union of emissions must equal the brute-force funnel exactly."""
    ordered = sorted(events, key=lambda e: (e[0], e[1]))
    bounds = sorted({c for c in cuts})
    batches: list[list] = []
    prev = -1
    for b in bounds:
        batches.append([e for e in ordered if prev < e[0] <= b])
        prev = b
    batches.append([e for e in ordered if e[0] > prev])

    st_tuple = _EMPTY
    emitted: dict[int, tuple] = {}

    def feed(batch_rows, wm):
        nonlocal st_tuple
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([ts for ts, _, _ in batch_rows], unit="us"),
                "event_id": [eid for _, eid, _ in batch_rows],
                "event_type": [ty for _, _, ty in batch_rows],
            }
        )
        out, new_state, _timer = _funnel_step(
            iter([pdf]), st_tuple, wm, STEPS, H
        )
        for row in out:
            assert row[0] not in emitted, "anchor resolved twice"
            emitted[row[0]] = tuple(row[1:])
        st_tuple = new_state if new_state is not None else _EMPTY

    for batch in batches:
        # wm advances to this batch's max ts — safe because batches cut
        # at distinct-ts boundaries (nothing at ≤ wm arrives later)
        wm = max((ts for ts, _, _ in batch), default=None)
        if wm is None:
            continue
        feed(batch, wm)
    feed([], 10**9)  # flush: watermark far past all data and horizons

    assert emitted == _brute_funnel(ordered)


@settings(max_examples=300, deadline=None)
@given(
    events=events_strategy,
    cuts=st.lists(st.integers(min_value=0, max_value=30), max_size=4),
)
def test_kernel_matches_brute_force_with_watermark_ties(events, cuts):
    """Split the ts-ordered stream at arbitrary ROW indexes — a cut can
    land mid-timestamp-group, so a later batch delivers rows with ts
    EQUAL to an earlier batch's watermark (legal in Spark: only ts
    strictly below the watermark is dropped). The kernel must treat
    ts == wm rows as pending (definite cutoff side='left', strict dead
    test) or it mis-declares anchors dead / matches them too early."""
    ordered = sorted(events, key=lambda e: (e[0], e[1]))
    idxs = sorted({c for c in cuts if c <= len(ordered)})
    batches, prev = [], 0
    for i in idxs:
        batches.append(ordered[prev:i])
        prev = i
    batches.append(ordered[prev:])

    st_tuple = _EMPTY
    emitted: dict[int, tuple] = {}

    def feed(batch_rows, wm):
        nonlocal st_tuple
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([ts for ts, _, _ in batch_rows], unit="us"),
                "event_id": [eid for _, eid, _ in batch_rows],
                "event_type": [ty for _, _, ty in batch_rows],
            }
        )
        out, new_state, _timer = _funnel_step(
            iter([pdf]), st_tuple, wm, STEPS, H
        )
        for row in out:
            assert row[0] not in emitted, "anchor resolved twice"
            emitted[row[0]] = tuple(row[1:])
        st_tuple = new_state if new_state is not None else _EMPTY

    wm = 0
    for batch in batches:
        # watermark = max delivered ts; rows with that exact ts may
        # still arrive in the NEXT batch (sequential row-index cuts)
        wm = max(max((ts for ts, _, _ in batch), default=wm), wm)
        feed(batch, wm)
    feed([], 10**9)

    assert emitted == _brute_funnel(ordered)
