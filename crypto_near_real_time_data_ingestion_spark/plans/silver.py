"""Silver plan: raw transcripts → cleansed, exactly-one-row-per-turn table.

Batch formulation (the semantic oracle) and streaming formulation share
the cleansing stage; they differ only in the dedup operator:

  batch:     cleanse → groupBy(conv_id, turn_idx) any-wins reduce
  streaming: cleanse → withWatermark(ts) → dropDuplicatesWithinWatermark

Reference parity: flatten/rename select (``silver_glue_job.py:209-246``),
cleansing (``:253-263``), dedup keep-latest (``:266-274``). The any-wins
grouped reduce is legal because duplicates are identical payload copies
(generator invariant mirroring the reprocessing scenario); it is chosen
over row_number because a grouped agg gets map-side partial aggregation —
at 100 TB the duplicate rows are combined BEFORE the shuffle, while a
window-rank ships every duplicate across the wire. The keep-latest rank
variant remains available as ``operators.dedup.dedup_latest_wins``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleansing import cleanse_turns
from ..operators.dedup import dedup_any_wins, dedup_stream_within_watermark

PAYLOAD_COLS = ("role", "text", "tool", "ts")
KEY_COLS = ("conv_id", "turn_idx")


def silver_batch(raw: DataFrame) -> DataFrame:
    """Deterministic batch silver table (the stream-equivalence oracle)."""
    cleansed = cleanse_turns(raw)
    out = dedup_any_wins(cleansed, KEY_COLS, PAYLOAD_COLS)
    return out.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def silver_stream(raw_stream: DataFrame, watermark: str = "15 minutes") -> DataFrame:
    """Streaming silver: same cleansing, watermark-bounded exact dedup."""
    cleansed = cleanse_turns(raw_stream)
    out = dedup_stream_within_watermark(cleansed, KEY_COLS, "ts", watermark)
    return out.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def with_ingestion_ts(df: DataFrame) -> DataFrame:
    """Sink-side processing-time stamp (``silver_glue_job.py:245`` analog).
    Kept out of the deterministic plan so oracle comparisons stay exact."""
    return df.withColumn("ingestion_ts_utc", F.current_timestamp())


SILVER_ORACLE_SQL_TEMPLATE = """
WITH cleansed AS (
    SELECT
        CAST(conv_id AS VARCHAR)      AS conv_id,
        CAST(turn_idx AS INTEGER)     AS turn_idx,
        lower(trim(role))             AS role,
        CAST(text AS VARCHAR)         AS text,
        nullif(trim(tool), '')        AS tool,
        CAST(ts AS TIMESTAMP)         AS ts
    FROM read_parquet('{path}')
    WHERE conv_id IS NOT NULL
      AND turn_idx IS NOT NULL AND turn_idx >= 0
      AND role IS NOT NULL
      AND ts IS NOT NULL
)
SELECT conv_id, turn_idx,
       min(role) AS role, min(text) AS text, min(tool) AS tool, min(ts) AS ts
FROM cleansed
GROUP BY conv_id, turn_idx
"""
