"""Slowly-changing-dimension (Type 2) history: validity intervals from a
change log, plus incremental batch maintenance.

The reference maintains its gold dimension state by partition-scoped
Iceberg overwrite (``gold_features_base_job.py:123-139``) — a Type 1
"current snapshot" shape. Type 2 is the lakehouse-standard extension
that KEEPS superseded versions as ``[valid_from, valid_to)`` intervals
so any fact can be joined against the dimension *as of* its event time
(the batch complement of ``operators/asof.py``).

Two entry points:

- ``scd2_history(changes)`` — full rebuild from a change log: collapse
  same-timestamp duplicates (keep-latest by seq, the W1/W2 rule), drop
  consecutive rows whose tracked attribute did not change, then derive
  intervals with ``lead``. Pure window functions over the key
  partitioning: ONE shuffle on the dimension key, no driver state —
  the 100 TB shape (each key's history is tiny even when there are
  billions of keys; skew would mean one entity with billions of
  changes, which the change-log grain rules out).
- ``scd2_apply(dim, updates)`` — incremental maintenance: only the
  keys PRESENT in the update batch are rewritten (their stored history
  re-derives the change log via ``valid_from``, merges the new rows,
  and rebuilds — cheap because per-key histories are small); untouched
  keys pass through byte-identical. This is the MERGE-shaped op a
  nightly dimension job runs. CONTRACT: updates must be append-only
  per key (every update ts strictly later than that key's last
  observed change-log ts). The dimension stores only CHANGE rows — the
  collapse drops consecutive-unchanged rows, so a late out-of-order
  update landing between historical rows can require a version the
  dimension no longer remembers; late data must instead replay from
  the bronze change log (which the medallion architecture retains).
  Under the contract, equivalence to the full rebuild is pytest-pinned
  (apply(history(batch1), batch2) == history(batch1 ∪ batch2) for any
  ts-boundary split).

Hash-grade safety: the tracked attribute is quantized
(``floor(value / tier_width)`` — a single IEEE division then FLOOR,
bit-identical across engines); no float aggregation anywhere. The
boolean ``is_current`` is surfaced as INTEGER so pandas string casts
agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TIER_WIDTH = 25.0


def _tiered(events: DataFrame, tier_width: float) -> DataFrame:
    """The demo change log over the driver's events table: each event is
    a potential profile change for (user_id, event_type); the tracked
    attribute is the value tier."""
    return events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") / F.lit(tier_width)).cast("int").alias("tier"),
    )


def scd2_history(
    changes: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    seq_col: str = "event_id",
    attr_col: str = "tier",
) -> DataFrame:
    """Build the Type 2 dimension from a change log (see module doc)."""
    keys = [F.col(c) for c in key_cols]
    # 1. same-timestamp duplicates: keep the highest seq (deterministic)
    w_dup = Window.partitionBy(*keys, ts_col).orderBy(F.desc(seq_col))
    latest = (
        changes.withColumn("__rn", F.row_number().over(w_dup))
        .filter(F.col("__rn") == 1)
        .drop("__rn", seq_col)
    )
    # 2. keep only rows where the tracked attribute actually changed
    w_key = Window.partitionBy(*keys).orderBy(ts_col)
    flagged = latest.select(
        *key_cols,
        ts_col,
        attr_col,
        F.lag(attr_col).over(w_key).alias("__prev"),
        F.row_number().over(w_key).alias("__rn"),
    )
    # row 1 is always a version start — `attr IS DISTINCT FROM prev`
    # alone would drop a NULL-attribute first row (NULL is not distinct
    # from the lag's out-of-partition NULL)
    changed = flagged.filter(
        (F.col("__rn") == 1)
        | ~F.col(attr_col).eqNullSafe(F.col("__prev"))
    ).drop("__prev", "__rn")
    # 3. validity intervals: half-open [valid_from, valid_to)
    w_ver = Window.partitionBy(*keys).orderBy(ts_col)
    return changed.select(
        *key_cols,
        attr_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w_ver).alias("valid_to"),
        F.lead(ts_col).over(w_ver).isNull().cast("int").alias("is_current"),
        F.row_number().over(w_ver).cast("long").alias("version"),
    )


def events_scd2(events: DataFrame, tier_width: float = TIER_WIDTH) -> DataFrame:
    """The graded entry: Type 2 history of each (user, event_type)
    profile tier over the driver-provided events table."""
    return scd2_history(_tiered(events, tier_width))


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    seq_col: str = "event_id",
    attr_col: str = "tier",
) -> DataFrame:
    """Incremental Type 2 maintenance (see module doc).

    ``dim`` is a prior ``scd2_history`` output; ``updates`` is a new
    change-log batch (same schema as ``scd2_history``'s input). Only
    keys present in ``updates`` are rebuilt; the rest of the dimension
    is untouched (at scale: a broadcast/bucketed semi-join prunes the
    rewrite set, and with a key-partitioned dimension layout the
    untouched partitions are not even rewritten on disk)."""
    touched = updates.select(*key_cols).distinct()
    rebuilt = scd2_rebuild_touched(
        dim, updates, key_cols=key_cols, ts_col=ts_col,
        seq_col=seq_col, attr_col=attr_col, touched=touched,
    )
    untouched = dim.join(touched, list(key_cols), "left_anti")
    return untouched.unionByName(rebuilt)


def scd2_rebuild_touched(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    seq_col: str = "event_id",
    attr_col: str = "tier",
    touched: DataFrame | None = None,
) -> DataFrame:
    """The rebuilt history of ONLY the update-touched keys (the rows a
    keyed MERGE sink needs — untouched keys are already in the sink).
    Under append-only updates a key's version list only extends, so
    merging these rows over the stored dimension is exact (no stale
    higher versions can remain). Exposed for the streaming maintenance
    runner (``streaming/scd2_maintenance.py``). ``touched`` lets a
    caller that already distinct'd the update keys pass the frame in
    instead of paying the aggregation twice."""
    if touched is None:
        touched = updates.select(*key_cols).distinct()
    # stored history → change log: every version row IS a change row at
    # its valid_from. The synthetic seq 0 never decides anything under
    # the append-only contract (update timestamps are strictly later
    # than every stored valid_from for the key).
    affected_old = (
        dim.join(touched, list(key_cols), "left_semi")
        .select(
            *key_cols,
            F.col("valid_from").alias(ts_col),
            F.lit(0).cast("long").alias(seq_col),
            attr_col,
        )
    )
    return scd2_history(
        affected_old.unionByName(
            updates.select(*key_cols, ts_col, F.col(seq_col).cast("long"), attr_col)
        ),
        key_cols=key_cols,
        ts_col=ts_col,
        seq_col=seq_col,
        attr_col=attr_col,
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    payload: tuple[str, ...] = ("tier", "version"),
    prefix: str = "dim_",
) -> DataFrame:
    """Point-in-time enrichment: each fact row gains the dimension
    version valid at its timestamp (``valid_from <= ts < valid_to``).

    Because ``scd2_history`` intervals are contiguous per key, the
    containing version IS the latest ``valid_from <= ts`` — so this is
    exactly the backward as-of join (``operators/asof.py``), ONE keyed
    shuffle, never the O(|facts|·|versions|) BETWEEN range join. Facts
    before the key's first version get nulls."""
    from .asof import asof_join

    return asof_join(
        facts,
        dim.select(*key_cols, "valid_from", *payload),
        keys=list(key_cols),
        left_time=ts_col,
        right_time="valid_from",
        payload=list(payload),
        prefix=prefix,
    )


# Oracle over the driver's `events` view (DuckDB). Mirrors the three
# stages; `floor(value/25)` is one IEEE double division + FLOOR on both
# engines, so tiers are bit-identical.
EVENTS_SCD2_ORACLE_SQL_TEMPLATE = """
WITH log AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(FLOOR(value / {tier_width}) AS INTEGER) AS tier
  FROM events
),
latest AS (
  SELECT user_id, event_type, ts, tier FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, event_type, ts
                                 ORDER BY event_id DESC) AS rn
    FROM log) WHERE rn = 1
),
changes AS (
  SELECT user_id, event_type, ts, tier FROM (
    SELECT *,
           lag(tier) OVER (PARTITION BY user_id, event_type ORDER BY ts) AS prev,
           row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts) AS rn
    FROM latest)
  WHERE rn = 1 OR tier IS DISTINCT FROM prev
)
SELECT user_id, event_type, tier,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts) AS valid_to,
       CAST(lead(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts) IS NULL
            AS INTEGER) AS is_current,
       CAST(row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts)
            AS BIGINT) AS version
FROM changes
"""

EVENTS_SCD2_ORACLE_SQL = EVENTS_SCD2_ORACLE_SQL_TEMPLATE.format(
    tier_width=TIER_WIDTH
)
