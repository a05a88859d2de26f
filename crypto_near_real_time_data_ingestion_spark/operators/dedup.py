"""Exact deduplication operators (batch window-rank and streaming watermark).

Reference semantics reproduced:
  * W1: rank over ``partitionBy(sha2_key).orderBy(ingestion_ts desc)``,
    keep rn=1 (``silver_glue_job.py:269-274``)
  * W2: same with the typed key ``(asset_id, event_time_utc)`` and
    ``desc_nulls_last`` (``gold_features_base_job.py:68-73``)

Spark-first mapping:
  * batch: ``Window.partitionBy(keys).orderBy(order desc)`` + row_number —
    one hash shuffle on the key; at 100 TB this is the dominant shuffle, so
    the silver plan co-partitions the WRITE on the same key to reuse it.
  * streaming: ``dropDuplicatesWithinWatermark(keys)`` — state bounded by
    the watermark delay; keyed state lives in the state store (RocksDB at
    scale). Keep-first vs the batch keep-latest: equal whenever duplicate
    rows are identical payload copies (the reprocessing scenario,
    ``milestone_silver.md:11-16``); tests assert this equivalence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Batch exact dedup: keep the latest row per key (W1/W2 analog).

    ``tiebreakers`` make the pick deterministic on exact ``order_col``
    ties (the reference's `first(...desc)` tie is nondeterministic —
    SURVEY §7.3.5); we order by (order desc, tiebreakers desc).
    """
    order = [F.desc_nulls_last(order_col)] + [F.desc_nulls_last(t) for t in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_any_wins(df: DataFrame, keys: Sequence[str], payload: Sequence[str]) -> DataFrame:
    """Batch exact dedup when duplicates are identical payload copies:
    a plain grouped ``any_value`` — cheaper than a rank (partial/map-side
    aggregation halves shuffle volume vs row_number, which must shuffle
    every duplicate row)."""
    aggs = [F.min(c).alias(c) for c in payload]  # min == any when copies identical
    return df.groupBy(*keys).agg(*aggs)


def dedup_stream_within_watermark(
    df: DataFrame,
    keys: Sequence[str],
    event_time_col: str = "ts",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Streaming exact dedup with watermark-bounded state.

    State per key is evicted once the watermark passes the key's event
    time — the eviction requirement of the north star. Duplicates beyond
    the watermark are dropped as late data (counted by the listener).
    """
    return df.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
