"""Streaming SCD2 maintenance ≡ full batch rebuild: the incremental
foreachBatch dimension job drained over a ts-ordered events stream
produces the same dimension as one-shot ``events_scd2``, at two
micro-batch granularities, and composes with point-in-time lookup."""

from __future__ import annotations

import os
import shutil

import pytest

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.datagen.events_stream import (
    build_events_stream_source,
)
from crypto_near_real_time_data_ingestion_spark.operators import scd2
from crypto_near_real_time_data_ingestion_spark.streaming.scd2_maintenance import (
    run_scd2_maintenance_to_completion,
)

WORK = "/tmp/spark_graft_test_scd2_stream"


def _drain(spark, n_chunks: int):
    src = build_events_stream_source(
        f"{SF_DIR}/events.parquet",
        os.path.join(WORK, f"src{n_chunks}"),
        n_chunks,
        sentinel=False,  # foreachBatch needs no watermark flush
    )
    work = os.path.join(WORK, f"run{n_chunks}")
    shutil.rmtree(work, ignore_errors=True)
    return run_scd2_maintenance_to_completion(
        spark, src, work, shuffle_partitions=4
    )


def _want(spark):
    return scd2.events_scd2(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    ).toPandas()


@pytest.mark.parametrize("n_chunks", [3, 6])
def test_maintained_dim_equals_full_rebuild(spark, n_chunks):
    sink = _drain(spark, n_chunks)
    got = sink.read(spark).drop("__batch_id")
    assert_df_equal(
        got, _want(spark), sort_cols=["user_id", "event_type", "version"]
    )


def test_rerun_is_noop_and_oracle_transfers(spark):
    """Replay over the drained work_dir changes nothing, and the
    maintained dimension answers the SAME DuckDB oracle as the graded
    batch entry."""
    src = os.path.join(WORK, "src3")
    work = os.path.join(WORK, "run3")
    if not os.path.isdir(work):
        pytest.skip("ordering: the equality test builds the drain first")
    sink = run_scd2_maintenance_to_completion(
        spark, src, work, shuffle_partitions=4
    )
    got = sink.read(spark).drop("__batch_id")
    want = duck_sql(scd2.EVENTS_SCD2_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["user_id", "event_type", "version"])


def test_maintained_dim_serves_pit_lookup(spark):
    """The streaming-maintained dimension composes with scd2_lookup:
    every fact resolves to the version containing its ts."""
    src = os.path.join(WORK, "src3")
    work = os.path.join(WORK, "run3")
    if not os.path.isdir(work):
        pytest.skip("ordering: the equality test builds the drain first")
    sink = run_scd2_maintenance_to_completion(
        spark, src, work, shuffle_partitions=4
    )
    dim = sink.read(spark).drop("__batch_id")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    facts = ev.select("event_id", "user_id", "event_type", "ts")
    got = scd2.scd2_lookup(facts, dim).select("event_id", "dim_tier", "dim_version")
    want = duck_sql(
        f"""
        WITH dim AS ({scd2.EVENTS_SCD2_ORACLE_SQL})
        SELECT e.event_id, d.tier AS dim_tier, d.version AS dim_version
        FROM events e
        LEFT JOIN dim d
          ON d.user_id = e.user_id AND d.event_type = e.event_type
         AND d.valid_from <= e.ts
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        """
    )
    assert_df_equal(got, want, sort_cols=["event_id"])
