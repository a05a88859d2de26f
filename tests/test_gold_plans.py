"""Gold plans vs DuckDB oracles: windows, sessions, pairs, features, events."""

from __future__ import annotations

import duckdb

from conftest import assert_df_equal, duck_sql
from crypto_near_real_time_data_ingestion_spark.operators.joins import (
    PAIRS_ORACLE_SQL_TEMPLATE,
    user_response_pairs,
)
from crypto_near_real_time_data_ingestion_spark.operators.sessionize import (
    SESSIONS_ORACLE_SQL_TEMPLATE,
    sessionize_batch,
)
from crypto_near_real_time_data_ingestion_spark.plans import events_gold as eg
from crypto_near_real_time_data_ingestion_spark.plans.gold_features import (
    CONV_FEATURES_ORACLE_SQL_TEMPLATE,
    conv_features,
)
from crypto_near_real_time_data_ingestion_spark.plans.gold_windows import (
    WINDOW_STATS_ORACLE_SQL_TEMPLATE,
    conv_window_stats,
)
from crypto_near_real_time_data_ingestion_spark.plans.silver import silver_batch
from crypto_near_real_time_data_ingestion_spark.sources import read_transcripts

SF_DIR = "/root/testdata/sf0.001"


def _silver(spark, transcripts_parquet):
    return silver_batch(read_transcripts(spark, transcripts_parquet))


def test_window_stats_hour(spark, transcripts_parquet):
    got = conv_window_stats(_silver(spark, transcripts_parquet), "hour")
    want = duckdb.sql(
        WINDOW_STATS_ORACLE_SQL_TEMPLATE.format(path=transcripts_parquet, grain="hour")
    ).df()
    assert_df_equal(got, want, sort_cols=["conv_id", "window_start"])


def test_window_stats_day(spark, transcripts_parquet):
    got = conv_window_stats(_silver(spark, transcripts_parquet), "day")
    want = duckdb.sql(
        WINDOW_STATS_ORACLE_SQL_TEMPLATE.format(path=transcripts_parquet, grain="day")
    ).df()
    assert_df_equal(got, want, sort_cols=["conv_id", "window_start"])


def test_sessions(spark, transcripts_parquet):
    got = sessionize_batch(_silver(spark, transcripts_parquet))
    want = duckdb.sql(
        SESSIONS_ORACLE_SQL_TEMPLATE.format(path=transcripts_parquet, gap_s=1800)
    ).df()
    assert_df_equal(got, want, sort_cols=["conv_id", "session_id"])


def test_pairs(spark, transcripts_parquet):
    got = user_response_pairs(_silver(spark, transcripts_parquet))
    want = duckdb.sql(PAIRS_ORACLE_SQL_TEMPLATE.format(path=transcripts_parquet)).df()
    assert_df_equal(got, want, sort_cols=["conv_id", "user_turn_idx"])


def test_conv_features(spark, transcripts_parquet):
    got = conv_features(_silver(spark, transcripts_parquet))
    want = duckdb.sql(
        CONV_FEATURES_ORACLE_SQL_TEMPLATE.format(path=transcripts_parquet, gap_s=1800)
    ).df()
    assert_df_equal(got, want, sort_cols=["conv_id", "turn_idx"])


def test_events_dedup_latest(spark):
    got = eg.events_dedup_latest(eg.read_events(spark, SF_DIR))
    want = duck_sql(eg.EVENTS_DEDUP_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["user_id", "event_type"])


def test_events_minute_qa(spark):
    got = eg.events_minute_qa(eg.read_events(spark, SF_DIR))
    want = duck_sql(eg.EVENTS_MINUTE_QA_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["minute"])


def test_events_ml_features(spark):
    got = eg.events_ml_features(eg.read_events(spark, SF_DIR))
    want = duck_sql(eg.EVENTS_ML_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["user_id", "dt"])
