#!/usr/bin/env python
"""Range-join scale demonstration: bin bucketing vs the naive theta join.

The pytest pins run on hand-sized frames; this is the wall-clock
evidence at a size where the cartesian shape visibly loses: 100k points
× 5k intervals = 5·10^8 theta comparisons for the naive plan
(BroadcastNestedLoopJoin) vs shuffle ∝ points + interval replicas +
true candidates for the binned equi-join — with IDENTICAL output
(asserted on every pair).

Inputs are derived deterministically from xxhash64 of the row id (no
RNG, no wall clock). Run: python scripts/range_join_scale_demo.py
(~1-3 min). Output: one JSON line — recorded in BASELINE.md §18.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_POINTS = int(os.environ.get("RJ_DEMO_POINTS", "100000"))
N_INTERVALS = int(os.environ.get("RJ_DEMO_INTERVALS", "5000"))
DOMAIN = int(os.environ.get("RJ_DEMO_DOMAIN", "1000000"))
MAX_SPAN = int(os.environ.get("RJ_DEMO_MAX_SPAN", "200"))
REPS = int(os.environ.get("RJ_DEMO_REPS", "2"))
# the 10^12-comparison BASELINE row: the theta join never finishes
# (DNF > 600 s), so reproducing it needs the naive side skipped —
# binned-only timing + pair count, no equality assert (the invariance
# evidence comes from the completing sizes)
SKIP_NAIVE = os.environ.get("RJ_DEMO_SKIP_NAIVE") == "1"


def main() -> None:
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.operators.range_join import range_join
    from crypto_near_real_time_data_ingestion_spark.session import get_spark

    spark = get_spark("range-join-scale-demo", cores=32)
    points = (
        spark.range(N_POINTS)
        .select(
            F.col("id").alias("pid"),
            F.pmod(F.xxhash64("id"), F.lit(DOMAIN)).alias("t"),
        )
        .localCheckpoint()
    )
    intervals = (
        spark.range(N_INTERVALS)
        .select(
            F.col("id").alias("iid"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(DOMAIN)).alias("lo"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(MAX_SPAN)) + 1).alias("span"),
        )
        .select("iid", "lo", (F.col("lo") + F.col("span")).alias("hi"))
        .localCheckpoint()
    )

    def best_of(label: str, fn) -> float:
        times = []
        for _ in range(REPS):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(f"# {label}: {[round(x, 1) for x in times]}", file=sys.stderr)
        return min(times)

    naive = lambda: points.join(
        intervals, (F.col("lo") <= F.col("t")) & (F.col("t") < F.col("hi"))
    )
    binned = lambda: range_join(points, intervals, "t", "lo", "hi")
    binned_s = best_of("binned", binned)
    out = {
        "metric": "range_join_scale_demo",
        "n_points": N_POINTS,
        "n_intervals": N_INTERVALS,
        "theta_comparisons": N_POINTS * N_INTERVALS,
        "binned_s": round(binned_s, 1),
    }
    if SKIP_NAIVE:
        out["n_pairs"] = binned().count()
        out["naive_s"] = "DNF(skipped)"
    else:
        naive_s = best_of("naive-theta", naive)
        got = {(r["pid"], r["iid"]) for r in binned().select("pid", "iid").collect()}
        want = {(r["pid"], r["iid"]) for r in naive().select("pid", "iid").collect()}
        assert got == want, "binned range join diverged from the theta join"
        out.update(
            n_pairs=len(want),
            naive_s=round(naive_s, 1),
            speedup=round(naive_s / binned_s, 2),
            pairs_equal=True,
        )
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
