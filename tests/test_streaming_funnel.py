"""Streaming funnel ≡ batch funnel: the keyed-state CEP form drained
over a ts-ordered events stream is bit-equal to the chained forward
as-of joins (whose DuckDB oracle therefore transfers), at two different
micro-batch granularities."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal

from crypto_near_real_time_data_ingestion_spark.datagen.events_stream import (
    build_events_stream_source,
)
from crypto_near_real_time_data_ingestion_spark.operators import funnel
from crypto_near_real_time_data_ingestion_spark.streaming.stateful_funnel import (
    run_funnel_to_completion,
)

WORK = "/tmp/spark_graft_test_funnel_stream"


@pytest.fixture(scope="module", autouse=True)
def _fresh_work():
    """A stale drain from a previous pytest session must never serve the
    rerun test (it would replay a checkpoint produced by older code)."""
    shutil.rmtree(WORK, ignore_errors=True)
    yield


def _build_source(out_dir: str, n_chunks: int) -> str:
    return build_events_stream_source(
        f"{SF_DIR}/events.parquet", out_dir, n_chunks, sentinel=True
    )


def _batch_want(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return (
        funnel.funnel_events(ev)
        .select("user_id", "event_id", "ts_0", "ts_1", "ts_2")
        .toPandas()
    )


@pytest.mark.parametrize("n_chunks", [3, 7])
def test_stream_funnel_equals_batch(spark, n_chunks):
    src = _build_source(os.path.join(WORK, f"src{n_chunks}"), n_chunks)
    work = os.path.join(WORK, f"run{n_chunks}")
    shutil.rmtree(work, ignore_errors=True)
    sink = run_funnel_to_completion(spark, src, work, shuffle_partitions=4)
    got = sink.read(spark).filter(F.col("event_id") >= 0)
    assert_df_equal(got, _batch_want(spark), sort_cols=["event_id"])


def test_stream_funnel_rerun_is_noop(spark):
    """Replaying the drained work_dir changes nothing (checkpoint +
    per-batch MERGE commit log)."""
    src = os.path.join(WORK, "src3")
    work = os.path.join(WORK, "run3")
    if not os.path.isdir(work):
        pytest.skip("ordering: equality test builds the drain first")
    sink = run_funnel_to_completion(spark, src, work, shuffle_partitions=4)
    got = sink.read(spark).filter(F.col("event_id") >= 0)
    assert_df_equal(got, _batch_want(spark), sort_cols=["event_id"])
