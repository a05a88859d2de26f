"""Salted two-phase aggregation: identical output to the unsalted plan."""

from __future__ import annotations

from crypto_near_real_time_data_ingestion_spark.operators.skew import (
    conv_window_stats_salted,
)
from crypto_near_real_time_data_ingestion_spark.plans.gold_windows import (
    conv_window_stats,
)
from crypto_near_real_time_data_ingestion_spark.plans.silver import silver_batch
from crypto_near_real_time_data_ingestion_spark.sources import read_transcripts

from conftest import assert_df_equal


def test_salted_equals_unsalted(spark, transcripts_parquet):
    silver = silver_batch(read_transcripts(spark, transcripts_parquet))
    got = conv_window_stats_salted(silver, "hour", n_salts=8)
    want = conv_window_stats(silver, "hour").toPandas()
    assert_df_equal(got, want, sort_cols=["conv_id", "window_start"], rtol=0)
