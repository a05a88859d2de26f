"""Planted hot-key measurement: salted two-phase vs unsalted window agg.

North-star: "skew from hot conversations is handled by salting conv_id
before the windowed hash-aggregate". This script MEASURES that claim on
a planted adversarial corpus (one conversation owning 50% of all turns —
far hotter than the datagen's Zipf head) instead of asserting it from
the plan shape alone (r3 verdict item 5).

Corpus: N synthetic turns, conv_hot holds every even row (50%); the
rest spread over 200k cold conversations. Timestamps span 2 hours so the
hot conversation concentrates into TWO (window, conv_id) groups — the
worst case for a hash-aggregate reducer.

What the measurement is expected to show (and why it is still worth
running): Spark's HashAggregateExec ALWAYS partial-aggregates before the
shuffle, so the hot group leaves each map task as ONE combined row —
shuffle traffic for the hot key is O(n_map_tasks), not O(rows), and the
reducer is never the straggler. Salting therefore buys nothing here and
costs one extra shuffle stage. The honest conclusion (recorded in
BASELINE.md) is that the salted form is the insurance policy for agg
shapes whose partials don't shrink (collect_list-class) or engines
without map-side combine — not a default.

Run: python scripts/skew_bench.py  [N_ROWS]  (default 32M)
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from crypto_near_real_time_data_ingestion_spark.operators.skew import (  # noqa: E402
    conv_window_stats_salted,
)
from crypto_near_real_time_data_ingestion_spark.plans.gold_windows import (  # noqa: E402
    conv_window_stats,
)
from crypto_near_real_time_data_ingestion_spark.session import get_spark  # noqa: E402


def planted(spark, n_rows: int):
    """50%-hot synthetic silver frame (deterministic, in-memory range)."""
    return spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit("conv_hot"))
        .otherwise(
            F.concat(F.lit("c"), F.pmod(F.hash("id"), F.lit(200_000)).cast("string"))
        )
        .alias("conv_id"),
        (F.col("id") % 1_000_000).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("role"),
        F.when(F.col("id") % 5 == 0, F.lit("search")).alias("tool"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 7200).alias("ts"),
    )


def timed(df, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    spark = get_spark("skew-bench")
    silver = planted(spark, n_rows)

    unsalted = conv_window_stats(silver, "hour")
    salted = conv_window_stats_salted(silver, "hour", n_salts=32)

    # sanity: identical results (bit-equal merge functions)
    a = unsalted.orderBy("conv_id", "window_start").toPandas()
    b = salted.orderBy("conv_id", "window_start").toPandas()
    assert a.equals(b[a.columns]), "salted != unsalted"

    t_unsalted = timed(unsalted)
    t_salted = timed(salted)
    print(
        f'{{"n_rows": {n_rows}, "hot_share": 0.5, '
        f'"unsalted_s": {t_unsalted:.2f}, "salted_s": {t_salted:.2f}, '
        f'"salted_over_unsalted": {t_salted / t_unsalted:.3f}}}'
    )


if __name__ == "__main__":
    main()
