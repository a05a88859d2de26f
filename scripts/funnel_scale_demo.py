#!/usr/bin/env python
"""Funnel scale demonstration: chained forward as-of joins vs the naive
per-step inequality join.

The pytest pins run on hand-sized frames; this is the wall-clock
evidence at a size where the per-key pair blowup visibly loses: N
events over few hot users means the naive formulation (for each step, a
self-join on user with a time-range theta predicate, then min per
anchor) materializes O(Σ_user n_A·n_B) candidate pairs per step, while
the union-merge forward as-of shuffles each side ONCE per step and
sorts within partitions — with IDENTICAL output (asserted row-for-row).

Inputs derive deterministically from xxhash64 of the row id (no RNG, no
wall clock). Run: python scripts/funnel_scale_demo.py (~2-4 min).
Output: one JSON line — recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS = int(os.environ.get("FUNNEL_DEMO_EVENTS", "300000"))
N_USERS = int(os.environ.get("FUNNEL_DEMO_USERS", "150"))
SPAN_S = int(os.environ.get("FUNNEL_DEMO_SPAN_S", str(30 * 86400)))
HORIZON_S = int(os.environ.get("FUNNEL_DEMO_HORIZON_S", "3600"))
REPS = int(os.environ.get("FUNNEL_DEMO_REPS", "2"))
STEPS = ("view", "click", "purchase")


def _naive_funnel(events, steps, horizon_s):
    """The O(pairs-per-key) formulation the oracle uses: per step, an
    inequality self-join + min per anchor."""
    from pyspark.sql import functions as F

    frontier = events.filter(F.col("event_type") == steps[0]).select(
        "user_id", F.col("ts").alias("ts_0"), "event_id"
    )
    for i, step in enumerate(steps[1:], start=1):
        rights = events.filter(F.col("event_type") == step).select(
            F.col("user_id").alias("r_uid"), F.col("ts").alias("r_ts")
        )
        prev = f"ts_{i - 1}"
        matched = (
            frontier.join(
                rights,
                (F.col("user_id") == F.col("r_uid"))
                & (F.col("r_ts") > F.col(prev))
                & (
                    F.col("r_ts")
                    <= F.col(prev) + F.expr(f"INTERVAL {horizon_s} SECOND")
                ),
            )
            .groupBy("event_id")
            .agg(F.min("r_ts").alias(f"ts_{i}"))
        )
        frontier = frontier.join(matched, "event_id", "left")
    return frontier


def main() -> None:
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.operators.funnel import funnel_events
    from crypto_near_real_time_data_ingestion_spark.session import get_spark

    spark = get_spark("funnel_demo", cores=int(os.environ.get("DEMO_CORES", "8")))
    base = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit("u")), F.lit(N_USERS)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in STEPS]),
            (F.pmod(F.xxhash64("id", F.lit("t")), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        F.timestamp_seconds(
            F.lit(1704067200)
            + F.pmod(F.xxhash64("id", F.lit("s")), F.lit(SPAN_S))
        ).alias("ts"),
    )
    events = base.localCheckpoint(eager=True)

    def run(fn):
        # noop write: count() alone lets Catalyst skip the cardinality-
        # preserving left joins (matched is unique per event_id), which
        # would time the scan instead of the funnel
        best = float("inf")
        n = None
        for _ in range(REPS):
            t0 = time.monotonic()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
            if n is None:
                n = df.count()
        return best, n

    t_asof, n_asof = run(lambda: funnel_events(events, STEPS, HORIZON_S))
    t_naive, n_naive = run(lambda: _naive_funnel(events, STEPS, HORIZON_S))
    assert n_asof == n_naive, (n_asof, n_naive)
    # row-level equality, not just counts
    a = funnel_events(events, STEPS, HORIZON_S)
    b = _naive_funnel(events, STEPS, HORIZON_S).select(*a.columns)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"{diff} differing rows"
    print(
        json.dumps(
            {
                "metric": "funnel_forward_asof_vs_naive_join",
                "events": N_EVENTS,
                "users": N_USERS,
                "anchors": n_asof,
                "asof_best_s": round(t_asof, 2),
                "naive_best_s": round(t_naive, 2),
                "speedup": round(t_naive / t_asof, 2),
                "identical_rows": True,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
