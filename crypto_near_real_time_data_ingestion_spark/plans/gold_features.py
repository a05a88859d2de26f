"""Gold per-turn rolling conversation features — the ML-training analog.

Reference parity: the ML job computes per-entity ordered lag/rolling/
z-score features and forward targets with ``pyspark.sql.Window``
(``gold_ml_training_job.py:57-146``, W5-W9). Mapped to transcripts: one
output row per silver turn carrying running conversation state:

  turn_count        running count                       (W7-frame analog)
  max_turn_idx      running max
  tool_call_rate    running tool-call fraction
  inter_turn_latency_p50/p95/p99  expanding exact percentiles of the
                    inter-turn gap (north-star percentile requirement)
  rolling_turns_10m count of turns in [ts−10 min, ts]   (range frame)
  session_id/start/end  30-min-gap session bookkeeping

All window specs share ``partitionBy(conv_id).orderBy(ts, turn_idx)``, so
Catalyst executes them over ONE exchange+sort (verified in the plan:
single Exchange hashpartitioning(conv_id)). The range frame orders by
``unix_micros(ts)`` — microsecond-exact, no truncation.

Streaming formulation of the same semantics lives in
``streaming/stateful.py`` (per-conv state via applyInPandasWithState);
this batch plan is its equivalence oracle.

Scale: the expanding exact percentile is O(n²)-ish per conversation in
the worst case; conversations are bounded (≤ few hundred turns), so the
per-key cost is small and the plan stays a single shuffle. Hot-key skew
is bounded by the same conversation-length bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FEATURE_COLS = [
    "conv_id",
    "turn_idx",
    "as_of_ts",
    "turn_count",
    "max_turn_idx",
    "tool_call_rate",
    "inter_turn_latency_p50",
    "inter_turn_latency_p95",
    "inter_turn_latency_p99",
    "rolling_turns_10m",
    "session_id",
    "session_start",
    "session_end",
]


def conv_features(silver: DataFrame, gap_s: int = 1800) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    w_us = Window.partitionBy("conv_id").orderBy(F.unix_micros(F.col("ts")))
    w_10m = w_us.rangeBetween(-600_000_000, 0)

    # interpolate percentiles over INTEGER microseconds: both Spark's
    # `percentile` and DuckDB's `quantile_cont` use a + d*(b-a) linear
    # interpolation, which is bit-identical on integer-valued doubles;
    # a single /1e6 at the end keeps the result bit-stable cross-engine
    # (rounding a near-half value would not be).
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    df = silver.withColumn("gap_us", gap_us.cast("double"))

    new_session = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(F.col("gap_us") >= F.lit(float(gap_s)) * 1e6, 1)
        .otherwise(0)
    )
    df = df.withColumn("session_id", F.sum(new_session).over(w_run).cast("int"))

    w_sess = Window.partitionBy("conv_id", "session_id")
    pct = lambda p: F.expr(f"percentile(gap_us, {p})").over(w_run) / F.lit(1e6)  # noqa: E731

    return df.select(
        "conv_id",
        "turn_idx",
        F.col("ts").alias("as_of_ts"),
        F.count(F.lit(1)).over(w_run).alias("turn_count"),
        F.max("turn_idx").over(w_run).alias("max_turn_idx"),
        (
            F.sum(F.col("tool").isNotNull().cast("long")).over(w_run)
            / F.count(F.lit(1)).over(w_run)
        ).alias("tool_call_rate"),
        pct(0.5).alias("inter_turn_latency_p50"),
        pct(0.95).alias("inter_turn_latency_p95"),
        pct(0.99).alias("inter_turn_latency_p99"),
        F.count(F.lit(1)).over(w_10m).alias("rolling_turns_10m"),
        "session_id",
        F.min("ts").over(w_sess).alias("session_start"),
        F.max("ts").over(w_sess).alias("session_end"),
    )


CONV_FEATURES_ORACLE_SQL_TEMPLATE = """
WITH cleansed AS (
    SELECT CAST(conv_id AS VARCHAR) AS conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
           lower(trim(role)) AS role, nullif(trim(tool), '') AS tool,
           CAST(ts AS TIMESTAMP) AS ts
    FROM read_parquet('{path}')
    WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL AND turn_idx >= 0
      AND role IS NOT NULL AND ts IS NOT NULL
),
silver AS (
    SELECT conv_id, turn_idx, min(role) AS role, min(tool) AS tool, min(ts) AS ts
    FROM cleansed GROUP BY conv_id, turn_idx
),
gapped AS (
    SELECT *,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS DOUBLE) AS gap_us,
           CASE WHEN lag(ts) OVER w IS NULL THEN 1
                WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {gap_s} * 1000000 THEN 1
                ELSE 0 END AS new_session
    FROM silver
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
sessions AS (
    SELECT *, CAST(sum(new_session) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_id
    FROM gapped
)
SELECT conv_id, turn_idx, ts AS as_of_ts,
       CAST(count(*) OVER w_run AS BIGINT) AS turn_count,
       max(turn_idx) OVER w_run AS max_turn_idx,
       CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) OVER w_run AS DOUBLE)
             / count(*) OVER w_run AS tool_call_rate,
       quantile_cont(gap_us, 0.5) OVER w_run / 1e6 AS inter_turn_latency_p50,
       quantile_cont(gap_us, 0.95) OVER w_run / 1e6 AS inter_turn_latency_p95,
       quantile_cont(gap_us, 0.99) OVER w_run / 1e6 AS inter_turn_latency_p99,
       CAST(count(*) OVER w_10m AS BIGINT) AS rolling_turns_10m,
       session_id,
       min(ts) OVER w_sess AS session_start,
       max(ts) OVER w_sess AS session_end
FROM sessions
WINDOW
    w_run AS (PARTITION BY conv_id ORDER BY ts, turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_10m AS (PARTITION BY conv_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW),
    w_sess AS (PARTITION BY conv_id, session_id)
"""


def conv_features_sketch(
    silver: DataFrame, gap_s: int = 1800, accuracy: int = 10000
) -> DataFrame:
    """The UNBOUNDED-KEYS variant of ``conv_features``: exact expanding
    percentiles swap for Spark's built-in mergeable GK sketch
    (``percentile_approx``) with rank error ≤ 1/accuracy. This is the
    documented state-size escape hatch — per-key memory becomes
    O(accuracy·log n) instead of O(turns) — for domains where
    "conversations" are unbounded (device telemetry, market ticks). The
    sketch buffer is Spark-internal (JVM, mergeable ⇒ map-side partial
    windows still work); everything else stays identical to the exact
    plan. Approximate ⇒ pytest-error-bound-tested, not oracle-graded
    (tests/test_gold_plans.py pins the rank-error contract)."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)

    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    df = silver.withColumn("gap_us", gap_us.cast("double"))
    pct = lambda p: (  # noqa: E731
        F.expr(f"percentile_approx(gap_us, {p}, {accuracy})").over(w_run)
        / F.lit(1e6)
    )
    return df.select(
        "conv_id",
        "turn_idx",
        F.col("ts").alias("as_of_ts"),
        F.count(F.lit(1)).over(w_run).alias("turn_count"),
        pct(0.5).alias("inter_turn_latency_p50"),
        pct(0.95).alias("inter_turn_latency_p95"),
        pct(0.99).alias("inter_turn_latency_p99"),
    )
