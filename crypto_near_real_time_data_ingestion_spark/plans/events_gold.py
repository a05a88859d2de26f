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


def events_json_entities(events: DataFrame) -> DataFrame:
    """P4–P6 literal: semi-structured bronze ingest of an ARRAY-of-entities
    + MAP-of-attrs JSON payload — ``explode_outer`` (empty arrays and
    malformed rows keep their row), ``map_entries`` (map → sortable
    key/value struct array), struct-field flatten. The payload is built
    from the row then round-tripped ``from_json(to_json(...), pinned
    schema)`` — the reference's own bronze pattern
    (``silver_glue_job.py:106-174``); every 7th row is deliberately
    corrupted so the malformed→null repair path (P4) is exercised too.

    Scale: pure Catalyst expressions end-to-end (JSON build/parse,
    lambda transforms) — whole-stage codegen, no shuffle, no Python."""
    ent = F.when(
        F.col("event_id") % 3 == 0,
        F.array().cast("array<struct<name:string,score:bigint>>"),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), (F.col("event_id") % 2).cast("int")),
            lambda i: F.struct(
                F.concat(F.col("event_type"), F.lit("_"), i.cast("string")).alias(
                    "name"
                ),
                ((F.col("event_id") + i) % 100).alias("score"),
            ),
        )
    )
    attrs = F.create_map(
        F.lit("t"), F.col("event_type"), F.lit("u"), F.col("user_id").cast("string")
    )
    raw = F.to_json(F.struct(ent.alias("entities"), attrs.alias("attrs")))
    # corrupt at byte 0: PERMISSIVE-mode partial results (Spark ≥3.4) can
    # salvage a parsed prefix from *trailing* corruption — a leading
    # garbage byte guarantees the all-null-fields row on both engines
    raw = F.when(F.col("event_id") % 7 == 0, F.concat(F.lit("x"), raw)).otherwise(raw)
    parsed = events.select(
        "event_id",
        F.from_json(
            raw,
            "struct<entities:array<struct<name:string,score:bigint>>,"
            "attrs:map<string,string>>",
        ).alias("p"),
    )
    kv_flat = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.map_entries(F.col("attrs"))),
            lambda kv: F.concat(kv.key, F.lit("="), kv.value),
        ),
    )
    return (
        parsed.select(
            "event_id",
            F.explode_outer("p.entities").alias("e"),
            F.col("p.attrs").alias("attrs"),
        )
        .select(
            "event_id",
            F.col("e.name").alias("entity_name"),
            F.col("e.score").alias("entity_score"),
            F.when(F.col("attrs").isNull(), F.lit(None).cast("string"))
            .otherwise(kv_flat)
            .alias("attrs_flat"),
        )
    )


EVENTS_JSON_ENTITIES_ORACLE_SQL = """
WITH base AS (SELECT event_id, event_type, user_id FROM events),
good AS (SELECT * FROM base WHERE event_id % 7 <> 0),
ent AS (
    SELECT event_id, NULL AS entity_name, NULL AS entity_score,
           event_type, user_id
    FROM good WHERE event_id % 3 = 0
    UNION ALL
    SELECT g.event_id, g.event_type || '_' || CAST(i AS VARCHAR),
           (g.event_id + i) % 100, g.event_type, g.user_id
    FROM good g CROSS JOIN (SELECT unnest(range(0, 2)) AS i) ii
    WHERE g.event_id % 3 <> 0 AND i <= g.event_id % 2
)
SELECT event_id, entity_name, CAST(entity_score AS BIGINT) AS entity_score,
       't=' || event_type || ',u=' || CAST(user_id AS VARCHAR) AS attrs_flat
FROM ent
UNION ALL
SELECT event_id, NULL, NULL, NULL FROM base WHERE event_id % 7 = 0
"""


# ---------------------------------------------------------------------------
# W3/W4 + A3-A5 literal form: the OHLC job (gold_ohlc_h_d_w_m.py:53-93)
# ---------------------------------------------------------------------------

OHLC_GRAINS = ("hour", "day", "week", "month")


def events_ohlc(events: DataFrame, grain: str = "hour") -> DataFrame:
    """Open/high/low/close of the metric per (entity, date_trunc(grain))
    period — the reference OHLC job 1:1, reformulated as ONE grouped
    aggregation (map-side partial agg; the reference's full-frame windows
    + row_number reduce shuffles every row unreduced). open/close =
    first/last NON-NULL value in (ts, event_id) order: the null-guarded
    ordering key makes ``min_by``/``max_by`` skip null metrics, exactly
    the reference's ``first(..., ignorenulls=True)`` (A5), with the
    deterministic tiebreak fixing its exact-tie nondeterminism."""
    if grain not in OHLC_GRAINS:
        raise ValueError(f"grain must be one of {OHLC_GRAINS}")
    order_sql = "CASE WHEN value IS NOT NULL THEN struct(ts, event_id) END"
    return (
        events.groupBy(
            F.col("user_id"), F.date_trunc(grain, F.col("ts")).alias("period")
        )
        .agg(
            F.expr(f"min_by(value, {order_sql})").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr(f"max_by(value, {order_sql})").alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.col("value").isNotNull().cast("long")).alias("valid_ticks"),
        )
        .select(
            "user_id",
            "period",
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
            "valid_ticks",
            F.lit(grain).alias("g"),
        )
    )


def events_ohlc_all_grains(events: DataFrame) -> DataFrame:
    """The unified multi-grain OHLC table the reference partitions by
    ``g`` (``sql/athena_projections_ddl_gold_ohlc.sql:3-39``): one union
    of the four grains; grain-filter views select ``WHERE g = ...``."""
    out = events_ohlc(events, OHLC_GRAINS[0])
    for g in OHLC_GRAINS[1:]:
        out = out.unionByName(events_ohlc(events, g))
    return out


def register_ohlc_views(spark: SparkSession, events: DataFrame) -> None:
    """The reference's Athena view layer (S13,
    ``sql/athena_projections_ddl_gold_ohlc.sql:44-54``): one view per
    grain over the unified table, expressed as Spark SQL DDL."""
    events_ohlc_all_grains(events).createOrReplaceTempView("gold_ohlc_all")
    for g in OHLC_GRAINS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW gold_ohlc_{g} AS "
            f"SELECT * FROM gold_ohlc_all WHERE g = '{g}'"
        )


# DuckDB arg_min/arg_max can't take a struct ordering key, so the oracle
# uses the rank formulation; (value IS NULL) sorts non-null first, making
# rn=1 the first/last NON-null value — same semantics as the null-guarded
# min_by/max_by above
OHLC_ORACLE_SQL_TEMPLATE = """
WITH base AS (
    SELECT *, date_trunc('{grain}', ts) AS period FROM events
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY user_id, period
                              ORDER BY (value IS NULL), ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY user_id, period
                              ORDER BY (value IS NULL), ts DESC, event_id DESC) AS rn_d
    FROM base
)
SELECT user_id, period,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(sum(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS valid_ticks,
       '{grain}' AS g
FROM ranked
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# W5-W10 + A2 + J1/J2: daily ML feature plan
# ---------------------------------------------------------------------------

# the reference's full window battery (gold_ml_training_job.py:57-146):
# lags n ∈ {1,3,7,14,30} (W5), trailing rolling mean/std excluding the
# current row over n ∈ {3,5,7,14,20,30} (W7), rolling missingness over
# the trailing 7/30 rows (W8)
LAG_NS = (1, 3, 7, 14, 30)
ROLL_NS = (3, 5, 7, 14, 20, 30)


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

    # Rolling mean/std over EXACT integer micro-units: windowed float avg
    # is engine-dependent in the last ULP (DuckDB evaluates window
    # aggregates over a segment tree — pairwise addition order — while
    # Spark sums the frame sequentially), and round(·,6) on a boundary
    # value then flips. v is round(·,6) so v*1e6 is integral; bigint
    # frame sums are exact in both engines, and the closed-form
    # mean/variance from those sums is the same float expression tree on
    # both sides → bit-identical, no rounding needed.
    v_us = F.round(F.col("v") * 1e6).cast("long")

    def _roll_mean(n: int):
        fr = w.rowsBetween(-n, -1)
        s1 = F.sum(v_us).over(fr).cast("double")
        cnt = F.count(v_us).over(fr).cast("double")
        return F.when(cnt > 0, s1 / cnt / F.lit(1e6)).alias(f"roll_mean_{n}")

    def _roll_std(n: int):
        # bigint sum-of-squares bound: needs v_us²·n < 2^63, i.e.
        # |v| ≲ 550 at n=30 (holds for this metric domain; for wider
        # domains drop to 1e4 micro-units or a two-pass m2 accumulation)
        fr = w.rowsBetween(-n, -1)
        s1 = F.sum(v_us).over(fr).cast("double")
        s2 = F.sum(v_us * v_us).over(fr).cast("double")
        cnt = F.count(v_us).over(fr).cast("double")
        var = (cnt * s2 - s1 * s1) / (cnt * (cnt - F.lit(1.0)))
        return F.when(
            cnt >= 2, F.sqrt(F.greatest(var, F.lit(0.0))) / F.lit(1e6)
        ).alias(f"roll_std_{n}")

    feat_cols = [
        "user_id",
        "dt",
        "v",
        "n_events",
        *[F.lag("v", n).over(w).alias(f"v_lag{n}") for n in LAG_NS],
        F.round(
            F.when(
                (F.col("v") > 0) & (F.lag("v", 1).over(w) > 0),
                F.log(F.col("v") / F.lag("v", 1).over(w)),
            ),
            6,
        ).alias("log_ret_1d"),
        *[_roll_mean(n) for n in ROLL_NS],
        *[_roll_std(n) for n in ROLL_NS],
        # W8: rolling missingness of the daily metric over trailing 7/30 rows
        F.sum(F.col("v").isNull().cast("long")).over(w.rowsBetween(-7, -1)).alias(
            "missing_7d"
        ),
        F.sum(F.col("v").isNull().cast("long")).over(w.rowsBetween(-30, -1)).alias(
            "missing_30d"
        ),
        F.lead("v", 1).over(w).alias("v_fwd1"),
    ]
    feat = daily.select(*feat_cols)
    for n in (3, 20):
        feat = feat.withColumn(
            f"zscore_{n}",
            F.round(
                F.when(
                    F.col(f"roll_std_{n}") > 0,
                    (F.col("v") - F.col(f"roll_mean_{n}")) / F.col(f"roll_std_{n}"),
                ),
                6,
            ),
        )
    feat = feat.withColumn(
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

    # J2: benchmark-entity join — the reference's filter-to-'BTC' self-join
    # (gold_ml_training_job.py:123-126); benchmark entity = user_id 0
    bench = daily.filter(F.col("user_id") == 0).select(
        "dt", F.col("v").alias("bench_v")
    )
    feat = feat.join(F.broadcast(bench), "dt", "left").withColumn(
        "rel_v_bench",
        F.round(F.when(F.col("bench_v") > 0, F.col("v") / F.col("bench_v")), 6),
    )

    # W10: two per-day rank variants
    w_day_v = Window.partitionBy("dt").orderBy(F.desc_nulls_last("v"))
    w_day_n = Window.partitionBy("dt").orderBy(F.desc_nulls_last("n_events"))
    return feat.select(
        "user_id",
        "dt",
        "v",
        F.col("n_events").cast("long").alias("n_events"),
        *[f"v_lag{n}" for n in LAG_NS],
        "log_ret_1d",
        *[f"roll_mean_{n}" for n in ROLL_NS],
        *[f"roll_std_{n}" for n in ROLL_NS],
        "missing_7d",
        "missing_30d",
        "zscore_3",
        "zscore_20",
        "v_fwd1",
        "y_up_1d_2pct",
        "mkt_vw_mean",
        "bench_v",
        "rel_v_bench",
        F.dense_rank().over(w_day_v).cast("long").alias("rank_v_day"),
        F.dense_rank().over(w_day_n).cast("long").alias("rank_events_day"),
        F.dayofweek("dt").cast("tinyint").alias("dow"),
        (F.last_day(F.col("dt").cast("date")) == F.col("dt").cast("date")).alias(
            "is_month_end"
        ),
    )


def _ml_oracle_sql() -> str:
    lag_exprs = ",\n           ".join(
        f"lag(v, {n}) OVER w AS v_lag{n}" for n in LAG_NS
    )
    # exact-integer-sum mean/std mirroring the Spark expression tree
    # (see events_ml_features: windowed float avg is ULP-different across
    # engines; integer micro-unit sums are exact in both)
    roll_mean_exprs = ",\n           ".join(
        f"CASE WHEN CAST(count(v_us) OVER roll{n} AS DOUBLE) > 0 THEN "
        f"CAST(sum(v_us) OVER roll{n} AS DOUBLE) "
        f"/ CAST(count(v_us) OVER roll{n} AS DOUBLE) / 1e6 END AS roll_mean_{n}"
        for n in ROLL_NS
    )
    roll_std_exprs = ",\n           ".join(
        f"CASE WHEN CAST(count(v_us) OVER roll{n} AS DOUBLE) >= 2 THEN "
        f"sqrt(greatest((CAST(count(v_us) OVER roll{n} AS DOUBLE) * CAST(sum(v_us * v_us) OVER roll{n} AS DOUBLE) "
        f"- CAST(sum(v_us) OVER roll{n} AS DOUBLE) * CAST(sum(v_us) OVER roll{n} AS DOUBLE)) "
        f"/ (CAST(count(v_us) OVER roll{n} AS DOUBLE) * (CAST(count(v_us) OVER roll{n} AS DOUBLE) - 1.0)), 0.0)) / 1e6 "
        f"END AS roll_std_{n}"
        for n in ROLL_NS
    )
    roll_windows = ",\n           ".join(
        f"roll{n} AS (PARTITION BY user_id ORDER BY dt "
        f"ROWS BETWEEN {n} PRECEDING AND 1 PRECEDING)"
        for n in ROLL_NS
    )
    lag_cols = ", ".join(f"f.v_lag{n}" for n in LAG_NS)
    roll_cols = ", ".join(
        [f"f.roll_mean_{n}" for n in ROLL_NS] + [f"f.roll_std_{n}" for n in ROLL_NS]
    )
    zscore_cols = ",\n       ".join(
        f"round(CASE WHEN f.roll_std_{n} > 0 THEN (f.v - f.roll_mean_{n}) / f.roll_std_{n} END, 6) AS zscore_{n}"
        for n in (3, 20)
    )
    return f"""
WITH daily0 AS (
    SELECT user_id, date_trunc('day', ts) AS dt,
           round(avg(value), 6) AS v,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
),
daily AS (
    SELECT *, CAST(round(v * 1e6) AS BIGINT) AS v_us FROM daily0
),
feat AS (
    SELECT user_id, dt, v, n_events,
           {lag_exprs},
           round(CASE WHEN v > 0 AND lag(v, 1) OVER w > 0
                      THEN ln(v / (lag(v, 1) OVER w)) END, 6) AS log_ret_1d,
           {roll_mean_exprs},
           {roll_std_exprs},
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) OVER roll7 AS BIGINT) AS missing_7d,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) OVER roll30 AS BIGINT) AS missing_30d,
           lead(v, 1) OVER w AS v_fwd1
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY dt),
           {roll_windows}
),
market AS (
    SELECT dt, round(sum(v * n_events) / sum(n_events), 6) AS mkt_vw_mean
    FROM daily GROUP BY dt
),
bench AS (
    SELECT dt, v AS bench_v FROM daily WHERE user_id = 0
)
SELECT f.user_id, f.dt, f.v, f.n_events, {lag_cols}, f.log_ret_1d,
       {roll_cols},
       f.missing_7d, f.missing_30d,
       {zscore_cols},
       f.v_fwd1,
       CASE WHEN f.v_fwd1 IS NOT NULL THEN CAST(f.v_fwd1 >= f.v * 1.02 AS INTEGER) END AS y_up_1d_2pct,
       m.mkt_vw_mean,
       b.bench_v,
       round(CASE WHEN b.bench_v > 0 THEN f.v / b.bench_v END, 6) AS rel_v_bench,
       CAST(dense_rank() OVER (PARTITION BY f.dt ORDER BY f.v DESC NULLS LAST) AS BIGINT) AS rank_v_day,
       CAST(dense_rank() OVER (PARTITION BY f.dt ORDER BY f.n_events DESC NULLS LAST) AS BIGINT) AS rank_events_day,
       CAST(dayofweek(f.dt) + 1 AS TINYINT) AS dow,
       last_day(CAST(f.dt AS DATE)) = CAST(f.dt AS DATE) AS is_month_end
FROM feat f LEFT JOIN market m USING (dt) LEFT JOIN bench b USING (dt)
"""


EVENTS_ML_ORACLE_SQL = _ml_oracle_sql()


def events_daily_users_sketch(events: DataFrame, rsd: float = 0.01) -> DataFrame:
    """Distinct-user rollup with the mergeable HLL++ sketch
    (``approx_count_distinct``) beside the exact count — the sketch
    family's second member (GK percentiles: ``gold_features.
    conv_features_sketch``). At 10^12 rows the exact distinct needs a
    full shuffle of the key universe; HLL's fixed ~kilobyte registers
    merge map-side, so the rollup is one partial-agg shuffle of
    sketches. Approximate ⇒ pytest-error-bound-tested (not
    oracle-graded)."""
    return events.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def events_unpivot(events: DataFrame) -> DataFrame:
    """Wide→long melt of per-minute QA metrics (the `unpivot`/`stack`
    relational op): one row per (minute, metric_name, metric_value).
    Pure Catalyst (`stack` after one grouped agg) — the long form every
    metrics store / feature registry ingests."""
    qa = events_minute_qa(events)
    return qa.select(
        "minute",
        F.expr(
            "stack(3, 'n_users', n_users, 'n_events', n_events, "
            "'null_values', null_values) AS (metric, value)"
        ),
    )


EVENTS_UNPIVOT_ORACLE_SQL = """
WITH qa AS (
    SELECT date_trunc('minute', ts) AS minute,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_values
    FROM events GROUP BY 1
)
SELECT minute, metric, value
FROM qa
UNPIVOT (value FOR metric IN (n_users, n_events, null_values))
"""
