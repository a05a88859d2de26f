"""Physical-plan regression tests: the properties that matter at 100 TB.

These read ``executedPlan`` strings and pin down:
  * filter pushdown reaches the parquet scan (silver)
  * column pruning (a narrow projection reads a narrow schema)
  * map-side partial aggregation before the dedup shuffle
  * all conv_features windows share ONE exchange on conv_id
  * the per-day factor join is a broadcast join (J1)
"""

from __future__ import annotations

from crypto_near_real_time_data_ingestion_spark.plans import events_gold as eg
from crypto_near_real_time_data_ingestion_spark.plans.gold_features import conv_features
from crypto_near_real_time_data_ingestion_spark.plans.silver import silver_batch
from crypto_near_real_time_data_ingestion_spark.sources import read_transcripts

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_silver_pushdown_and_partial_agg(spark, transcripts_parquet):
    plan = _plan(silver_batch(read_transcripts(spark, transcripts_parquet)))
    scan = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan and "isnotnull(conv_id" in scan[0], "filters must reach the scan"
    assert "partial_min" in plan, "dedup reduce must partially aggregate map-side"
    assert plan.count("Exchange") == 1, "silver is a single-shuffle plan"


def test_column_pruning(spark, transcripts_parquet):
    narrow = silver_batch(read_transcripts(spark, transcripts_parquet)).select(
        "conv_id", "turn_idx"
    )
    scan = [l for l in _plan(narrow).splitlines() if "FileScan parquet" in l][0]
    assert "text" not in scan, "unused text column must be pruned from the scan"


def test_conv_features_single_exchange(spark, transcripts_parquet):
    silver = silver_batch(read_transcripts(spark, transcripts_parquet))
    plan = _plan(conv_features(silver))
    # one exchange for the dedup key + one for conv_id windows; all window
    # specs share the conv_id exchange
    assert plan.count("Exchange hashpartitioning") == 2, plan.count("Exchange")


def test_events_ml_broadcast_join(spark):
    plan = _plan(eg.events_ml_features(eg.read_events(spark, SF_DIR)))
    assert "BroadcastHashJoin" in plan, "per-day factor join must broadcast (J1)"
