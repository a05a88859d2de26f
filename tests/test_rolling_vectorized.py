"""Vectorized applyInPandas rolling features == Catalyst-window formulation."""

from __future__ import annotations

from conftest import assert_df_equal
from crypto_near_real_time_data_ingestion_spark.operators.rolling import (
    conv_features_vectorized,
)
from crypto_near_real_time_data_ingestion_spark.plans.gold_features import conv_features
from crypto_near_real_time_data_ingestion_spark.plans.silver import silver_batch
from crypto_near_real_time_data_ingestion_spark.sources import read_transcripts


def test_vectorized_equals_catalyst(spark, transcripts_parquet):
    silver = silver_batch(read_transcripts(spark, transcripts_parquet))
    got = conv_features_vectorized(silver)
    want = conv_features(silver).toPandas()
    assert_df_equal(got, want, sort_cols=["conv_id", "turn_idx"], rtol=0)
