"""Stateful per-conversation features: stream vs batch equivalence."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from conftest import assert_df_equal
from crypto_near_real_time_data_ingestion_spark.datagen.flush import (
    FLUSH_CONV_ID,
    build_flushed_source,
)
from crypto_near_real_time_data_ingestion_spark.plans.gold_features import conv_features
from crypto_near_real_time_data_ingestion_spark.plans.silver import silver_batch
from crypto_near_real_time_data_ingestion_spark.sources import read_transcripts
from crypto_near_real_time_data_ingestion_spark.streaming.engine import (
    run_pipeline_to_completion,
)

WORK = "/tmp/spark_graft_stateful"

CAUSAL_COLS = [
    "conv_id",
    "turn_idx",
    "as_of_ts",
    "turn_count",
    "max_turn_idx",
    "tool_call_rate",
    "inter_turn_latency_p50",
    "inter_turn_latency_p95",
    "inter_turn_latency_p99",
    "rolling_turns_10m",
    "session_id",
    "session_start",
]


@pytest.fixture(scope="module")
def drained_features(spark, stream_parquet_dir):
    shutil.rmtree(WORK, ignore_errors=True)
    fsrc = build_flushed_source(stream_parquet_dir, os.path.join(WORK, "source"))
    h = run_pipeline_to_completion(
        spark, fsrc, WORK, queries=("features",), max_files_per_trigger=2
    )
    return h


def test_stateful_features_equal_batch(spark, transcripts_parquet, drained_features):
    got = (
        drained_features.sinks["features"]
        .read(spark)
        .filter(F.col("conv_id") != FLUSH_CONV_ID)
        .select(*CAUSAL_COLS)
    )
    want = (
        conv_features(silver_batch(read_transcripts(spark, transcripts_parquet)))
        .select(*CAUSAL_COLS)
        .toPandas()
    )
    assert_df_equal(got, want, sort_cols=["conv_id", "turn_idx"], rtol=0)
