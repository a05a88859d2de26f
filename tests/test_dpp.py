"""Dynamic Partition Pruning over the hive-partitioned gold layout:
the runtime analog of the planning-time ``PartitionFilters`` the
partitioned sources already pin.

At 100 TB the classic shape is a dt-partitioned fact joined to a
filtered dimension: the selective predicate sits on a DIM attribute,
so static partition pruning can see nothing — DPP builds the dim's
partition-key set at runtime (from the broadcast) and injects it into
the fact scan as ``dynamicpruningexpression``, reading only the
matching partitions. This test proves it three ways: the expression is
in the plan, the executed scan's runtime metrics read exactly the
surviving partitions (2 of 30), and the DPP-disabled control reads all
30 (so the pruning is demonstrably dynamic, not static).

Reference parity: the Athena partition-projection reads
(``sql/athena_projections_*.sql``) get this join-time pruning for free
from the engine; S2/S10's layouts are what make it possible.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from crypto_near_real_time_data_ingestion_spark.sources.partitioned import (
    write_gold_partitioned,
)

N_DAYS = 30
KEEP_DAYS = 2
FACT_PATH = "/tmp/spark_graft_test_dpp_fact"


@pytest.fixture(scope="module")
def fact_path(spark):
    shutil.rmtree(FACT_PATH, ignore_errors=True)
    fact = spark.range(60000).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(
            F.lit(1704067200)
            + F.pmod(F.col("id"), F.lit(N_DAYS)) * 86400
            + F.col("id") % 1000
        ).alias("window_start"),
        (F.col("id") % 100).alias("v"),
    )
    write_gold_partitioned(fact, FACT_PATH)
    return FACT_PATH


def _dim(spark):
    return spark.createDataFrame(
        [
            (f"2024-01-{d:02d}", "keep" if d <= KEEP_DAYS else "drop")
            for d in range(1, N_DAYS + 1)
        ],
        "dt_s string, flag string",
    ).select(F.to_date("dt_s").alias("dt"), "flag")


def _scan_metrics(df) -> dict[str, int]:
    """Runtime metrics of the (single) parquet scan in the EXECUTED
    plan (shared walker: conftest.executed_plan_metrics)."""
    from conftest import executed_plan_metrics

    scans = executed_plan_metrics(df, "FileSourceScanExec")
    assert scans, "no FileSourceScanExec in the executed plan"
    return scans[0]


def _join(spark, fact_path):
    fact = spark.read.parquet(fact_path)
    dim = _dim(spark).filter(F.col("flag") == "keep")
    return fact.join(F.broadcast(dim), "dt").groupBy().agg(F.sum("v").alias("s"))


def test_dpp_prunes_fact_partitions_at_runtime(spark, fact_path):
    j = _join(spark, fact_path)
    total = j.collect()[0]["s"]
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    m = _scan_metrics(j)
    # runtime pruning: 2 of 30 dt partitions read; staticFilesNum shows
    # the pre-DPP universe, so the gap is demonstrably DYNAMIC
    assert m["numPartitions"] == KEEP_DAYS, m
    assert m["staticFilesNum"] == N_DAYS, m

    # control: DPP off reads every partition, same result
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try:
        j2 = _join(spark, fact_path)
        assert j2.collect()[0]["s"] == total
        m2 = _scan_metrics(j2)
        assert m2["numPartitions"] == N_DAYS, m2
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
        )


def test_static_partition_filter_still_prunes_at_planning(spark, fact_path):
    """The planning-time complement: a literal dt predicate never needs
    DPP — PartitionFilters prune before execution (S2/S10 contract)."""
    fact = spark.read.parquet(fact_path)
    j = fact.filter(F.col("dt") == "2024-01-01").agg(F.sum("v").alias("s"))
    j.collect()
    m = _scan_metrics(j)
    assert m["numPartitions"] == 1, m
