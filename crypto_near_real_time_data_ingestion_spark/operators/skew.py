"""Hot-key skew handling: salted two-phase windowed aggregation.

North-star requirement: "skew from hot conversations is handled by
salting conv_id before the windowed hash-aggregate". The reference never
needed this (11 entities, no skew — SURVEY §4).

MEASURED SCOPE (round 4, `scripts/skew_bench.py`, BASELINE.md §11): for
THIS aggregate family — decomposable stats — the unsalted plan is
already skew-immune and 2.3× FASTER than the salted one on a planted
50%-hot corpus, because HashAggregateExec's map-side partial aggregate
collapses the hot (window, conv_id) group to one row per map task
before the shuffle. Keep the salted shape for aggregates whose partials
do not shrink (collect_list-class) or engines without map-side combine;
for join-side hot keys use AQE's skew-join split instead.

Mechanics: phase 1 groups by (key…, salt = pmod(hash(row-unique), N)) so
a hot key's rows spread over N reducers and are PARTIALLY aggregated;
phase 2 re-aggregates the N partials per key with merge functions.
Every aggregate here is decomposable:

  count/sum       → sum of partials
  min/max         → min/max of partials
  min_by/max_by   → carried as (orderkey, value) structs, min/max-merged
  ratio (rate)    → numerator+denominator carried, divided in phase 2

The result is bitwise-identical to the unsalted plan (integer merges,
single final division), so the same DuckDB oracle validates both. AQE's
skew handling only splits *join* partitions; hash-aggregate skew needs
this explicit two-phase shape.

At 1000-executor scale: phase-1 shuffle spreads the hot key over
``n_salts`` reducers; phase-2 shuffle moves only ``n_salts`` rows per
(window, conv_id) — negligible. Choose n_salts ≈ a few × executors for
the hottest expected key share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.gold_windows import GRAINS, STAT_COLS


def conv_window_stats_salted(
    silver: DataFrame, grain: str = "hour", n_salts: int = 16
) -> DataFrame:
    """Salted two-phase variant of ``plans.gold_windows.conv_window_stats``
    — identical output, skew-resistant shuffle."""
    win = F.window("ts", GRAINS[grain])
    order = F.struct(F.col("ts"), F.col("turn_idx"))
    salted = silver.withColumn(
        "__salt", F.pmod(F.hash("turn_idx", "ts"), F.lit(n_salts))
    )

    partial = salted.groupBy(win.alias("w"), "conv_id", "__salt").agg(
        F.count(F.lit(1)).alias("p_n"),
        F.sum((F.col("role") == "user").cast("long")).alias("p_user"),
        F.sum((F.col("role") == "assistant").cast("long")).alias("p_assistant"),
        F.sum((F.col("role") == "tool").cast("long")).alias("p_tool_role"),
        F.sum(F.col("tool").isNotNull().cast("long")).alias("p_tool_calls"),
        F.min_by(F.struct(order.alias("o"), F.col("turn_idx").alias("v")), order).alias(
            "p_first"
        ),
        F.max_by(F.struct(order.alias("o"), F.col("turn_idx").alias("v")), order).alias(
            "p_last"
        ),
        F.min("ts").alias("p_min_ts"),
        F.max("ts").alias("p_max_ts"),
    )

    final = partial.groupBy("w", "conv_id").agg(
        F.sum("p_n").alias("n_turns"),
        F.sum("p_user").alias("n_user"),
        F.sum("p_assistant").alias("n_assistant"),
        F.sum("p_tool_role").alias("n_tool"),
        (F.sum("p_tool_calls") / F.sum("p_n")).alias("tool_call_rate"),
        F.min_by(F.col("p_first.v"), F.col("p_first.o")).alias("first_turn_idx"),
        F.max_by(F.col("p_last.v"), F.col("p_last.o")).alias("last_turn_idx"),
        F.min("p_min_ts").alias("first_ts"),
        F.max("p_max_ts").alias("last_ts"),
    )

    return final.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "conv_id",
        *STAT_COLS[3:12],
        F.lit(grain).alias("grain"),
    )
