"""Bucketed tables: shuffle-free co-located joins and aggregations.

The reference pays a shuffle every time silver joins or re-aggregates
on its keys (`gold_features_base_job.py` re-reads and re-partitions per
job); Spark's answer for a key that is joined/aggregated REPEATEDLY is
to pay the partitioning once at write time: ``bucketBy(n, key)`` hashes
rows into a fixed number of file buckets, and every later equi-join or
group-by on that key between same-bucketed tables plans with NO
Exchange on either side — the join is executed bucket-by-bucket against
co-numbered files (plus no Sort when ``sortBy`` matches the join key).

This is the table-layout member of the engine's shuffle-avoidance
family (broadcast for small dims, AQE skew split for hot keys, z-order
for scan pruning): at 100 TB a fact table joined on ``conv_id`` by
every downstream job amortizes its one big shuffle across all of them.

Mechanics that matter (and are pinned in tests/test_bucketed.py):
  * bucket metadata lives in the catalog, so bucketed writes go through
    ``saveAsTable`` (plain ``.parquet()`` writes lose it);
  * both sides must hash-bucket the SAME key into the SAME count —
    a mismatched count re-shuffles the smaller side only;
  * results are byte-identical to the shuffled plan (asserted);
  * one-sided bucketing still removes that side's Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed on ``bucket_cols``
    (optionally sorted within buckets — what removes the join's Sort).
    Overwrites any existing table of the same name."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two bucketed catalog tables on their bucket key. When
    both tables bucket ``on`` with equal counts, the executed plan has
    zero Exchange operators (verified by the caller/tests via
    ``executedPlan``) — the physical join runs bucket-by-bucket."""
    return spark.table(left_table).join(spark.table(right_table), on)
