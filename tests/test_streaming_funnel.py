"""Streaming funnel ≡ batch funnel: the keyed-state CEP form drained
over a ts-ordered events stream is bit-equal to the chained forward
as-of joins (whose DuckDB oracle therefore transfers), at two different
micro-batch granularities."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal

from crypto_near_real_time_data_ingestion_spark.operators import funnel
from crypto_near_real_time_data_ingestion_spark.streaming.stateful_funnel import (
    run_funnel_to_completion,
)

WORK = "/tmp/spark_graft_test_funnel_stream"


def _build_source(out_dir: str, n_chunks: int) -> str:
    """ts-sorted chunked copy of the events table + a sentinel flush file
    (event_id = −1, far-future ts) with ascending mtimes so the file
    stream replays arrival order and the watermark passes all real data."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    t = pq.read_table(f"{SF_DIR}/events.parquet").sort_by(
        [("ts", "ascending"), ("event_id", "ascending")]
    )
    per = -(-t.num_rows // n_chunks)
    paths = []
    for i in range(n_chunks):
        chunk = t.slice(i * per, per)
        if chunk.num_rows:
            p = os.path.join(out_dir, f"part-{i:05d}.parquet")
            pq.write_table(chunk, p)
            paths.append(p)
    flush_ts = pa.compute.max(t["ts"]).as_py() + __import__("datetime").timedelta(
        days=3
    )
    sentinel = pa.table(
        {
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([flush_ts], t.schema.field("ts").type),
            "user_id": pa.array([0], pa.int64()),
            "event_type": pa.array(["__flush__"]),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array(["{}"]),
        }
    ).select([f.name for f in t.schema])
    p = os.path.join(out_dir, f"part-{n_chunks:05d}.parquet")
    pq.write_table(sentinel.cast(t.schema), p)
    paths.append(p)
    base = 1_700_000_000
    for i, path in enumerate(paths):
        os.utime(path, (base + i, base + i))
    return out_dir


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
