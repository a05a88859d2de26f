"""Hive-partitioned table layouts — the reference's physical data model.

Reference parity:
  * silver ``y=/m=/d=/h=`` path partitioning with a pre-write
    ``repartition`` on the partition columns and ``maxRecordsPerFile``
    (``silver_glue_job.py:287-303``, operators S2/S9);
  * gold ``dt=`` (+ entity) partitioning with dynamic-partition-overwrite
    so a rewrite touches only the partitions present in the batch
    (``gold_features_base_job.py:123-139``, S10);
  * partition-projection reads: Spark's Hive-style partition discovery
    turns predicates on partition columns into ``PartitionFilters`` —
    pruned at planning time, never scanned (the Athena
    partition-projection analog, ``sql/athena_projections_*.sql``).

Scale notes: the ``repartition`` on partition values consolidates each
partition's rows onto one task so the sink writes one file per partition
per batch instead of one per (task × partition) — at 1000 executors the
difference between 24 files/day and 24,000. ``maxRecordsPerFile`` caps
the opposite failure (one giant file). Partition-column derivation is
pure ``date_format`` (Catalyst, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SILVER_PART_COLS = ("y", "m", "d", "h")
MAX_RECORDS_PER_FILE = 2_000_000


def with_silver_partitions(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the reference's y/m/d/h partition columns from event time
    (``silver_glue_job.py:287-291``)."""
    return (
        df.withColumn("y", F.date_format(ts_col, "yyyy"))
        .withColumn("m", F.date_format(ts_col, "MM"))
        .withColumn("d", F.date_format(ts_col, "dd"))
        .withColumn("h", F.date_format(ts_col, "HH"))
    )


def write_silver_partitioned(silver: DataFrame, path: str) -> None:
    """Append-mode hourly-partitioned silver write (S2/S9)."""
    (
        with_silver_partitions(silver)
        .repartition(*SILVER_PART_COLS)
        .write.mode("append")
        .option("maxRecordsPerFile", MAX_RECORDS_PER_FILE)
        .partitionBy(*SILVER_PART_COLS)
        .parquet(path)
    )


def read_silver_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Partition-discovering read; predicates on y/m/d/h become
    planning-time ``PartitionFilters`` (verified in tests)."""
    return spark.read.parquet(path)


def write_gold_partitioned(
    gold: DataFrame, path: str, dt_source_col: str = "window_start"
) -> None:
    """Dynamic-partition-overwrite gold write, ``dt=`` partitioned (S10):
    re-running a day replaces exactly that day's partition — the
    reference's idempotent daily-batch discipline. (The streaming engine
    uses the keyed MERGE sink instead; this is the batch-mode sink.)"""
    (
        gold.withColumn("dt", F.to_date(dt_source_col))
        .repartition("dt")
        .write.mode("overwrite")  # dynamic via session conf partitionOverwriteMode
        .partitionBy("dt")
        .parquet(path)
    )
