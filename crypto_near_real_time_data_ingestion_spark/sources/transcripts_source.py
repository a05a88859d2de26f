"""Transcripts source: fixed-schema batch and rate-controlled stream readers.

Replaces the reference's ingestion chain (HTTP fetch → partitioned JSON put
→ Glue DynamicFrame scan with bookmarks, ``app.py:92-161``,
``silver_glue_job.py:41-53``) with a declarative Spark source:

* batch: ``spark.read.schema(...).parquet(path)`` — fixed StructType, so
  Catalyst gets full pushdown/pruning and no inference pass (the
  reference's union-type inference pain, ``challenges_overcome.md:37-56``,
  cannot occur).
* stream: ``spark.readStream`` file source with ``maxFilesPerTrigger`` —
  the local stand-in for an Iceberg streaming read with
  ``stream-from-timestamp``/``max-files-per-micro-batch``. Glue job
  bookmarks (``terraform/silver_glue_job.tf:26``) become the query's
  checkpoint offsets.

At 100 TB the production source is an Iceberg table partitioned by
``days(ts)`` + ``bucket(conv_id)``; the file-source code path here keeps
the identical schema and downstream plan, so swapping the format string
is the only change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Batch scan with a pinned schema (no inference)."""
    return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)


def read_transcripts_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Rate-controlled streaming scan of a transcripts directory.

    ``maxFilesPerTrigger`` bounds per-micro-batch input (the reference's
    5-minute tick cadence analog, ``terraform/eventBridge.tf:2-7``);
    ``latestFirst=false`` preserves arrival order across files.
    """
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(path)
    )
