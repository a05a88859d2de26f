"""Multi-dimensional OLAP aggregation: ROLLUP / CUBE subtotals and pivot.

The reference's gold layer materializes one table per grain and unions
them behind a grain-filter view (``gold_ohlc_h_d_w_m.py:53``,
``sql/athena_projections_ddl_gold_ohlc.sql``) — the hand-rolled form of
what ANSI GROUPING SETS compute in one pass. This module is the
declarative Spark-first version of that pattern plus the wide/long
reshape the reference's per-metric gold columns imply:

- ``events_rollup``: one shuffle produces the (type, day), (type), and
  grand-total grains simultaneously (``ROLLUP``), with ``GROUPING()``
  flags disambiguating subtotal NULLs from data NULLs. At 100 TB this
  replaces G sequential per-grain jobs with a single pass — Spark
  expands the grouping sets map-side and the partial aggregation
  (count / countDistinct partials, min/max) still combines before the
  exchange, so shuffle volume stays ∝ groups, not rows × grains.
- ``events_cube``: the full 2^d grain lattice (pytest-oracled twin —
  same code path, denser output).
- ``events_pivot``: long→wide reshape (the inverse of the graded
  ``events_unpivot``) as conditional aggregation over an EXPLICIT
  pinned vocabulary — one pass, stable output schema, plus a strict
  mode that counts off-vocabulary rows in the SAME pass. (Never call
  ``.pivot(col)`` without values at scale: Spark first runs a distinct
  job over the pivot column AND caps it at
  ``spark.sql.pivotMaxValues``.)

Hash-grade safety: aggregates are row counts (BIGINT), distinct counts
(BIGINT), and min/max (no accumulation) — no float sums, so the driver
value-hash is exact (CLAUDE.md oracle-parity invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pinned pivot-value list: the datagen's closed event-type vocabulary.
# The default (strict="ignore") silently drops an unexpected type;
# strict="error"/"other" surface it in the same aggregation pass —
# planted off-vocab pytest in tests/test_olap.py.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _with_day(events: DataFrame) -> DataFrame:
    return events.withColumn("day", F.date_trunc("day", F.col("ts")))


def events_rollup(events: DataFrame) -> DataFrame:
    """Per-(type, day) stats + per-type subtotals + grand total in ONE
    aggregation pass (A3/A4's multi-grain form, S13's view-union
    collapsed into grouping sets)."""
    return (
        _with_day(events)
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
        )
    )


EVENTS_ROLLUP_ORACLE_SQL = """
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       min(value) AS min_value, max(value) AS max_value,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(date_trunc('day', ts)) AS INTEGER) AS g_day
FROM events
GROUP BY ROLLUP(event_type, date_trunc('day', ts))
"""


def events_cube(events: DataFrame) -> DataFrame:
    """Full grain lattice: adds the per-day-across-types subtotal ROLLUP
    lacks. Same plan shape (one pass, grouping-set expansion)."""
    return (
        _with_day(events)
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
        )
    )


EVENTS_CUBE_ORACLE_SQL = EVENTS_ROLLUP_ORACLE_SQL.replace(
    "GROUP BY ROLLUP", "GROUP BY CUBE"
)


def events_pivot(events: DataFrame, strict: str = "ignore") -> DataFrame:
    """Daily long→wide: one BIGINT count column per event type, as ONE
    conditional-aggregation pass over the pinned vocabulary (dense: an
    absent (day, type) combination counts 0, which is what a downstream
    feature matrix wants; ``.pivot(col, values)`` compiles to exactly
    this form, minus strict mode's extra column).

    ``strict``: what to do with rows whose ``event_type`` is OUTSIDE the
    pinned vocabulary — a pinned-list pivot silently drops them, which
    at 100 TB is a data-quality bug that surfaces as column drift weeks
    later. Off-vocabulary counting rides the SAME single aggregation
    pass (one extra conditional-count column — no second job, no
    distinct scan):

    - ``"ignore"`` (default): the pinned-list fast path, drop silently.
    - ``"error"``: raise ``ValueError`` if any off-vocabulary row
      exists (count materialized from the one aggregate pass).
    - ``"other"``: emit an ``__other`` BIGINT column holding the
      off-vocabulary count per day.
    """
    if strict not in ("ignore", "error", "other"):
        raise ValueError(f"strict must be ignore|error|other, got {strict!r}")
    # NULL event_type is off-vocabulary too (isin yields NULL for NULL —
    # a bare ~isin would silently skip those rows in the count)
    in_vocab = F.coalesce(F.col("event_type").isin(*EVENT_TYPES), F.lit(False))
    agg_cols = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(t)
        for t in EVENT_TYPES
    ]
    if strict != "ignore":
        agg_cols.append(F.count(F.when(~in_vocab, 1)).alias("__other"))
    # conditional aggregation, not .pivot(): same single-pass plan shape
    # (partial count per group map-side), pinned output schema, and the
    # off-vocabulary column shares the pass instead of needing a second
    # scan. .pivot(col, values) compiles to exactly this form anyway.
    wide = _with_day(events).groupBy("day").agg(*agg_cols)
    if strict == "error":
        # materialize the (days-sized, tiny) aggregate ONCE: the guard
        # and the returned frame must read the SAME scan — lazily the
        # caller's later action would re-aggregate the source, paying
        # 2× and (on a concurrently-appended table) validating a
        # different read than it returns
        wide = wide.localCheckpoint(eager=True)
        bad = wide.agg(F.sum("__other")).first()[0] or 0
        if bad:
            raise ValueError(
                f"events_pivot(strict='error'): {bad} rows carry an "
                f"event_type outside the pinned vocabulary {EVENT_TYPES}"
            )
        wide = wide.drop("__other")
    return wide


EVENTS_PIVOT_ORACLE_SQL = """
SELECT date_trunc('day', ts) AS day,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
FROM events
GROUP BY 1
"""
