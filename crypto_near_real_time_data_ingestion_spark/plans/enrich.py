"""Stream-static dimension enrichment — J1's streaming analog.

The reference broadcasts a tiny per-day market dimension into its ML
feature join (``gold_ml_training_job.py:79-87``, operator J1); this is
the same pattern inside a STREAMING plan: a static dimension DataFrame
joined into the watermarked stream. Spark handles stream-static joins
natively — the static side is broadcast into every micro-batch (no
state, no watermark on the static side), and the downstream windowed
aggregate remains an ordinary watermark-driven append query.

The demonstration groups per (hour window, role_group) where
``role_group`` comes from the DIMENSION, not the stream — so a correct
result proves the join actually fed the aggregate, and the streaming
output is value-gradable against a plain SQL oracle with the dimension
inlined as VALUES.

Scale: the dimension is O(roles) — bytes. Broadcast cost is a one-time
per-executor transfer; the aggregate's shuffle carries one row per
(window, role_group) per mapper after partial aggregation, i.e. O(hours
× groups), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (role, role_group, is_generated): the tiny conformed dimension. Roles
# missing from the dimension fall into 'unknown' via the left join.
ROLE_DIM_ROWS = [
    ("user", "human", False),
    ("assistant", "agent", True),
    ("tool", "agent", True),
]


def role_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        ROLE_DIM_ROWS, "role string, role_group string, is_generated boolean"
    )


def _enriched_agg(joined: DataFrame) -> DataFrame:
    return (
        joined.groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.coalesce("role_group", F.lit("unknown")).alias("role_group"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count("tool").alias("n_tool_calls"),
            F.count(F.when(F.col("is_generated"), F.lit(1))).alias("n_generated"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role_group",
            "n_turns",
            "n_tool_calls",
            "n_generated",
            "total_chars",
        )
    )


def enriched_role_stats(silver: DataFrame, spark: SparkSession) -> DataFrame:
    """Batch twin of :func:`enriched_role_stats_stream` (same plan minus
    the watermark) — backs the streaming equivalence test."""
    return _enriched_agg(
        silver.join(F.broadcast(role_dim(spark)), "role", "left")
    )


def enriched_role_stats_stream(
    silver_stream: DataFrame, spark: SparkSession
) -> DataFrame:
    """Stream-static broadcast enrichment feeding a windowed aggregate.
    ``silver_stream`` must already carry a watermark (set in the silver
    plan and inherited here, like every other gold stream)."""
    return _enriched_agg(
        silver_stream.join(F.broadcast(role_dim(spark)), "role", "left")
    )


# dimension inlined as VALUES; silver CTE matches the other transcript
# oracles (any-wins dedup). date_trunc('hour') == F.window('1 hour')
# because hour windows are epoch-aligned.
ENRICHED_ORACLE_SQL_TEMPLATE = """
WITH cleansed AS (
    SELECT CAST(conv_id AS VARCHAR) AS conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
           lower(trim(role)) AS role, CAST(text AS VARCHAR) AS text,
           nullif(trim(tool), '') AS tool, CAST(ts AS TIMESTAMP) AS ts
    FROM read_parquet('{path}')
    WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL AND turn_idx >= 0
      AND role IS NOT NULL AND ts IS NOT NULL
),
silver AS (
    SELECT conv_id, turn_idx, min(role) AS role, min(text) AS text,
           min(tool) AS tool, min(ts) AS ts
    FROM cleansed GROUP BY conv_id, turn_idx
),
dim(role, role_group, is_generated) AS (
    VALUES ('user', 'human', false),
           ('assistant', 'agent', true),
           ('tool', 'agent', true)
),
j AS (
    SELECT s.ts, s.tool, s.text,
           coalesce(d.role_group, 'unknown') AS role_group, d.is_generated
    FROM silver s LEFT JOIN dim d ON s.role = d.role
)
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       role_group,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(tool) AS BIGINT) AS n_tool_calls,
       CAST(count(CASE WHEN is_generated THEN 1 END) AS BIGINT) AS n_generated,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM j
GROUP BY 1, 2, 3
"""
