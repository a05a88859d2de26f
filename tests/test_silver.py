"""Silver plan: cleansing + exact dedup vs DuckDB oracle, and invariants."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from conftest import assert_df_equal
from crypto_near_real_time_data_ingestion_spark.plans.silver import (
    SILVER_ORACLE_SQL_TEMPLATE,
    silver_batch,
)
from crypto_near_real_time_data_ingestion_spark.sources import read_transcripts


def test_silver_matches_oracle(spark, transcripts_parquet):
    raw = read_transcripts(spark, transcripts_parquet)
    got = silver_batch(raw)
    oracle = duckdb.sql(
        SILVER_ORACLE_SQL_TEMPLATE.format(path=transcripts_parquet)
    ).df()
    assert_df_equal(got, oracle, sort_cols=["conv_id", "turn_idx"])


def test_silver_invariants(spark, transcripts_parquet):
    raw = read_transcripts(spark, transcripts_parquet)
    s = silver_batch(raw)
    # exactly one row per (conv_id, turn_idx)
    dupes = s.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1)
    assert dupes.count() == 0
    # required fields non-null, roles normalized
    bad = s.filter(
        F.col("conv_id").isNull()
        | F.col("turn_idx").isNull()
        | (F.col("turn_idx") < 0)
        | F.col("role").isNull()
        | F.col("ts").isNull()
        | ~F.col("role").isin("user", "assistant", "tool")
    )
    assert bad.count() == 0


def test_silver_text_byte_equality(spark, transcripts_parquet):
    """Per-turn text-equality invariant: silver text == raw text for
    surviving keys (no mangling in the pipeline)."""
    raw = read_transcripts(spark, transcripts_parquet)
    s = silver_batch(raw)
    joined = s.alias("s").join(
        raw.alias("r"),
        on=[F.col("s.conv_id") == F.col("r.conv_id"), F.col("s.turn_idx") == F.col("r.turn_idx")],
    )
    mismatch = joined.filter(
        ~(F.col("s.text").eqNullSafe(F.col("r.text")))
    )
    assert mismatch.count() == 0
