"""Runtime Bloom-filter join pruning — the row-level sibling of the
Dynamic Partition Pruning pin (`test_dpp.py`).

When the fact-dim join key is NOT the partition key, DPP can't help;
Spark's runtime filter instead aggregates a Bloom filter over the
(small, filtered) creation side and injects `might_contain` into the
application side BEFORE its shuffle — at 100 TB that's the difference
between shuffling the whole fact table and shuffling the ~matching
fraction. The production gate is size-based
(`applicationSideScanSizeThreshold` = 10 GiB by default — exactly the
regime a real fact table is in); the test lowers it to force the
feature at fixture scale and measures the effect with the shuffle's
own runtime metrics:

  * filter ON : fact-side shuffle writes only the matching rows (1%)
  * filter OFF: the same shuffle writes every fact row (control —
    proving the reduction came from the injected filter)
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

FACT_PATH = "/tmp/spark_graft_test_bloom_fact"
DIM_PATH = "/tmp/spark_graft_test_bloom_dim"
N_FACT = 200_000
N_KEYS = 1_000
KEEP_KEYS = 10  # 1% selectivity


@pytest.fixture(scope="module")
def tables(spark):
    shutil.rmtree(FACT_PATH, ignore_errors=True)
    shutil.rmtree(DIM_PATH, ignore_errors=True)
    spark.range(N_FACT).select(
        (F.col("id") % N_KEYS).alias("k"), (F.col("id") % 7).alias("v")
    ).write.parquet(FACT_PATH)
    spark.range(N_KEYS).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < KEEP_KEYS, "keep").otherwise("drop").alias("flag"),
    ).write.parquet(DIM_PATH)
    return FACT_PATH, DIM_PATH


def _fact_shuffle_records(df) -> int:
    """Records written by the LARGEST shuffle in the executed plan —
    the fact side (the dim shuffle is ≤ N_KEYS rows). Shared walker:
    conftest.executed_plan_metrics."""
    from conftest import executed_plan_metrics

    shuffles = executed_plan_metrics(df, "ShuffleExchangeExec")
    assert shuffles, "no shuffle in the executed plan"
    return max(m["shuffleRecordsWritten"] for m in shuffles)


def _run(spark, tables, bloom_on: bool):
    fact = spark.read.parquet(tables[0])
    dim = spark.read.parquet(tables[1]).filter(F.col("flag") == "keep")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": str(bloom_on).lower(),
        # the production gate is 10 GiB of application-side scan — force
        # the feature at fixture scale
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = fact.join(dim, "k").groupBy().agg(F.count("*").alias("n"))
        n = j.collect()[0]["n"]
        plan = j._jdf.queryExecution().executedPlan().toString()
        return n, plan, _fact_shuffle_records(j)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_runtime_bloom_prunes_fact_shuffle(spark, tables):
    expect = N_FACT // N_KEYS * KEEP_KEYS
    n_on, plan_on, shuffled_on = _run(spark, tables, bloom_on=True)
    assert n_on == expect
    assert "might_contain" in plan_on, plan_on
    # only the matching 1% of fact rows reach the shuffle
    assert shuffled_on == expect, shuffled_on

    n_off, plan_off, shuffled_off = _run(spark, tables, bloom_on=False)
    assert n_off == expect
    assert "might_contain" not in plan_off
    # control: every fact row shuffles without the runtime filter
    assert shuffled_off == N_FACT, shuffled_off
