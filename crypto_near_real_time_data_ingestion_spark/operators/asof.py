"""As-of join — "latest right row at or before the left row's time".

The temporal-join primitive Spark lacks natively (and the leakage-safe
way to attach slowly-changing aggregates to events at feature time),
expressed Spark-first as UNION-MERGE instead of a range join:

  1. union both sides into one keyed timeline (right rows carry the
     payload, left rows carry nulls);
  2. one window ``last(payload, ignorenulls=True)`` over
     (key ORDER BY t, side) with side ordered right-before-left, so
     each left row sees exactly the latest right payload with
     ``r.t <= l.t``;
  3. filter back to left rows.

Why this shape at 100 TB: a naive inequality join ``l.t >= r.t`` is a
range join — O(|L|·|R|) pairs per key before the "latest" filter. The
union-merge is ONE hash shuffle on the key and a single sort — cost
O((|L|+|R|) log) per partition, no pair blowup, and Catalyst keeps the
whole thing JVM-side (no UDFs). Skewed keys take the same salting
treatment as any windowed plan.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` — an independent engine's
implementation of the same semantics, which is exactly what the driver
compares against.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``prefix+right_time`` and
    ``prefix+col`` for each payload col, from the latest ``right`` row of
    the same key with ``right_time <= left_time`` (nulls if none)."""
    keys = list(keys)
    lcols = [c for c in left.columns]
    l_side = left.select(
        *lcols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_time].dataType).alias(f"{prefix}{right_time}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in payload
        ],
    )
    r_side = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in keys
            else F.col(c)
            for c in lcols
        ],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),  # sorts BEFORE left at equal time ⇒ <= semantics
        F.col(right_time).alias(f"{prefix}{right_time}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )
    u = l_side.unionByName(r_side)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    attached = [f"{prefix}{right_time}"] + [f"{prefix}{c}" for c in payload]
    for c in attached:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).select(*lcols, *attached)


def events_asof_ohlc(events: DataFrame) -> DataFrame:
    """Feature-time attachment demo: each event gains the latest DAILY
    OHLC row of its user with period <= event ts (the as-of pattern a
    training pipeline uses to join slowly-changing aggregates without
    future leakage beyond the period grain)."""
    from ..plans.events_gold import events_ohlc

    daily = events_ohlc(events, "day").select(
        "user_id", "period", "high", "low", "n_ticks"
    )
    return asof_join(
        events.select("event_id", "user_id", "ts"),
        daily,
        keys=["user_id"],
        left_time="ts",
        right_time="period",
        payload=["high", "low", "n_ticks"],
    )


EVENTS_ASOF_OHLC_ORACLE_SQL = """
WITH daily AS (
    SELECT user_id, date_trunc('day', ts) AS period,
           max(value) AS high, min(value) AS low,
           CAST(count(*) AS BIGINT) AS n_ticks
    FROM events GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       d.period AS asof_period, d.high AS asof_high, d.low AS asof_low,
       d.n_ticks AS asof_n_ticks
FROM events e
ASOF LEFT JOIN daily d ON e.user_id = d.user_id AND e.ts >= d.period
"""
