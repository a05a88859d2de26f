"""Gold plans over the driver-provided ``events`` table.

These reproduce the reference's gold programs 1:1 on a numeric
time-series (entity=user_id, metric=value) — the closest driver-provided
analog of the reference's (asset_id, price) ticks — so each reference
operator family gets a direct, DuckDB-checkable demonstration:

* ``events_dedup_latest``  — keep-latest window dedup (W1/W2,
  ``silver_glue_job.py:266-274``; ``gold_features_base_job.py:68-73``)
* ``events_minute_qa``     — per-minute countDistinct + conditional sum
  (A1, ``silver_glue_job.py:277-284``)
* ``events_ml_features``   — daily per-entity lag/rolling/z-score/lead
  features, per-day ranks, cross-sectional weighted-mean join-back
  (W5-W10, A2, J1/J2, P20-P24; ``gold_ml_training_job.py:57-157``)

Scale notes: the daily aggregate keyed on (user_id, dt) gets map-side
partial agg; all per-entity windows share one Exchange on user_id; the
per-day cross-sectional factor is a tiny relation → explicit
``F.broadcast`` (the reference relied on auto-broadcast, J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# W1/W2: keep-latest exact dedup
# ---------------------------------------------------------------------------

def events_dedup_latest(events: DataFrame) -> DataFrame:
    """Latest event per (user_id, event_type); ties broken by event_id desc."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc_nulls_last("ts"), F.desc_nulls_last("event_id")
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


EVENTS_DEDUP_ORACLE_SQL = """
SELECT user_id, event_type, event_id, ts, value
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
    FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# A1: per-minute QA aggregate
# ---------------------------------------------------------------------------

def events_minute_qa(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
        )
    )


EVENTS_MINUTE_QA_ORACLE_SQL = """
SELECT date_trunc('minute', ts) AS minute,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_values
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# P8/S6 analog: semi-structured JSON payload parsing (bronze-style ingest)
# ---------------------------------------------------------------------------

def events_props_parse(events: DataFrame) -> DataFrame:
    """Parse the JSON ``props`` payload with a pinned schema and aggregate —
    the transcript-domain stand-in for the reference's JSON bronze ingest +
    ``from_json(to_json(...), fixed_schema)`` schema pin
    (``silver_glue_job.py:147-174``). ``from_json`` with an explicit
    StructType: no inference, malformed rows → null (kept, counted)."""
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), "struct<k:int>").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("p.k").isNull().cast("long")).alias("null_props"),
        F.sum("p.k").alias("sum_k"),
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
    )


EVENTS_PROPS_ORACLE_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_props,
       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# W5-W10 + A2 + J1/J2: daily ML feature plan
# ---------------------------------------------------------------------------

def events_ml_features(events: DataFrame) -> DataFrame:
    daily = (
        events.groupBy(
            F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("dt")
        )
        .agg(
            F.round(F.avg("value"), 6).alias("v"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )

    w = Window.partitionBy("user_id").orderBy("dt")
    roll3 = w.rowsBetween(-3, -1)  # trailing, EXCLUDING current (W7 frame)

    feat = daily.select(
        "user_id",
        "dt",
        "v",
        "n_events",
        F.lag("v", 1).over(w).alias("v_lag1"),
        F.lag("v", 3).over(w).alias("v_lag3"),
        F.round(
            F.when(
                (F.col("v") > 0) & (F.lag("v", 1).over(w) > 0),
                F.log(F.col("v") / F.lag("v", 1).over(w)),
            ),
            6,
        ).alias("log_ret_1d"),
        F.round(F.avg("v").over(roll3), 6).alias("roll_mean_3"),
        F.round(F.stddev_samp("v").over(roll3), 6).alias("roll_std_3"),
        F.lead("v", 1).over(w).alias("v_fwd1"),
    )
    feat = feat.withColumn(
        "zscore_3",
        F.round(
            F.when(
                F.col("roll_std_3") > 0,
                (F.col("v") - F.col("roll_mean_3")) / F.col("roll_std_3"),
            ),
            6,
        ),
    ).withColumn(
        "y_up_1d_2pct",
        F.when(F.col("v_fwd1").isNotNull(), (F.col("v_fwd1") >= F.col("v") * 1.02).cast("int")),
    )

    # cross-sectional per-day factor (A2): event-weighted mean, joined back (J1)
    market = daily.groupBy("dt").agg(
        F.round(F.sum(F.col("v") * F.col("n_events")) / F.sum("n_events"), 6).alias(
            "mkt_vw_mean"
        )
    )
    feat = feat.join(F.broadcast(market), "dt", "left")

    w_day = Window.partitionBy("dt").orderBy(F.desc_nulls_last("v"))
    return feat.select(
        "user_id",
        "dt",
        "v",
        F.col("n_events").cast("long").alias("n_events"),
        "v_lag1",
        "v_lag3",
        "log_ret_1d",
        "roll_mean_3",
        "roll_std_3",
        "zscore_3",
        "v_fwd1",
        "y_up_1d_2pct",
        "mkt_vw_mean",
        F.dense_rank().over(w_day).cast("long").alias("rank_v_day"),
        F.dayofweek("dt").cast("tinyint").alias("dow"),
        (F.last_day(F.col("dt").cast("date")) == F.col("dt").cast("date")).alias(
            "is_month_end"
        ),
    )


EVENTS_ML_ORACLE_SQL = """
WITH daily AS (
    SELECT user_id, date_trunc('day', ts) AS dt,
           round(avg(value), 6) AS v,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
),
feat AS (
    SELECT user_id, dt, v, n_events,
           lag(v, 1) OVER w AS v_lag1,
           lag(v, 3) OVER w AS v_lag3,
           round(CASE WHEN v > 0 AND lag(v, 1) OVER w > 0
                      THEN ln(v / (lag(v, 1) OVER w)) END, 6) AS log_ret_1d,
           round(avg(v) OVER roll3, 6) AS roll_mean_3,
           round(stddev_samp(v) OVER roll3, 6) AS roll_std_3,
           lead(v, 1) OVER w AS v_fwd1
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY dt),
           roll3 AS (PARTITION BY user_id ORDER BY dt ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
),
market AS (
    SELECT dt, round(sum(v * n_events) / sum(n_events), 6) AS mkt_vw_mean
    FROM daily GROUP BY dt
)
SELECT f.user_id, f.dt, f.v, f.n_events, f.v_lag1, f.v_lag3, f.log_ret_1d,
       f.roll_mean_3, f.roll_std_3,
       round(CASE WHEN f.roll_std_3 > 0 THEN (f.v - f.roll_mean_3) / f.roll_std_3 END, 6) AS zscore_3,
       f.v_fwd1,
       CASE WHEN f.v_fwd1 IS NOT NULL THEN CAST(f.v_fwd1 >= f.v * 1.02 AS INTEGER) END AS y_up_1d_2pct,
       m.mkt_vw_mean,
       CAST(dense_rank() OVER (PARTITION BY f.dt ORDER BY f.v DESC NULLS LAST) AS BIGINT) AS rank_v_day,
       CAST(dayofweek(f.dt) + 1 AS TINYINT) AS dow,
       last_day(CAST(f.dt AS DATE)) = CAST(f.dt AS DATE) AS is_month_end
FROM feat f LEFT JOIN market m USING (dt)
"""
