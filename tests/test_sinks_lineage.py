"""Exactly-once sink internals: commit log, lineage manifests, listener."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from crypto_near_real_time_data_ingestion_spark.streaming.sinks import ParquetMergeSink

WORK = "/tmp/spark_graft_sink_unit"


def _mk_df(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")


def test_merge_sink_upsert_and_manifests(spark):
    shutil.rmtree(WORK, ignore_errors=True)
    sink = ParquetMergeSink(WORK, ["conv_id", "turn_idx"], "ts")

    import datetime as dt

    t = dt.datetime(2025, 1, 1)
    sink.process_batch(_mk_df(spark, [("a", 0, t), ("a", 1, t)]), 0)
    sink.process_batch(_mk_df(spark, [("a", 1, t), ("b", 0, t)]), 1)  # upsert a/1

    got = sink.read(spark)
    assert got.count() == 3  # (a,0), (a,1) latest, (b,0)
    assert sink.committed_batches() == [0, 1]

    m = sink.manifests()
    assert len(m) == 2
    assert m[0]["stats"]["rows"] == "2"
    assert m[1]["stats"]["min_conv_id"] == "a" and m[1]["stats"]["max_conv_id"] == "b"
    # event-time range tracked for partition-level lineage
    assert "min_ts" in m[0]["stats"]

    # replay batch 1 with DIFFERENT data → skipped (exactly-once)
    sink.process_batch(_mk_df(spark, [("z", 9, t)]), 1)
    assert sink.read(spark).filter(F.col("conv_id") == "z").count() == 0


def test_listener_counts_progress(spark, stream_parquet_dir):
    from crypto_near_real_time_data_ingestion_spark.streaming.engine import (
        run_pipeline_to_completion,
    )
    from crypto_near_real_time_data_ingestion_spark.streaming.listener import (
        MetricsListener,
    )

    work = "/tmp/spark_graft_listener_unit"
    shutil.rmtree(work, ignore_errors=True)
    lst = MetricsListener(jsonl_path=os.path.join("/tmp", "listener_unit.jsonl"))
    spark.streams.addListener(lst)
    try:
        run_pipeline_to_completion(
            spark, stream_parquet_dir, work, queries=("silver",), max_files_per_trigger=8
        )
        assert lst.total_input_rows("silver") > 0
        assert len(lst.batch_durations_ms("silver")) > 0
        assert os.path.exists("/tmp/listener_unit.jsonl")
    finally:
        spark.streams.removeListener(lst)
