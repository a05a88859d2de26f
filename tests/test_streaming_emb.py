"""Streaming exact embedding near-dup == batch block-GEMM pairs.

The sharded stateful index (`streaming/stateful_emb.py`) fed the corpus
as an arrival-ordered stream must emit bit-for-bit the pairs the batch
`broadcast_near_dup_pairs` finds over the same corpus — same float64
GEMM, same round-half-away(6) cosines — regardless of the shard count
(a parallelism knob, not a correctness knob), and a re-run over the
same work_dir must be a no-op (checkpoint + sink commit log).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd

from conftest import SF_DIR
from crypto_near_real_time_data_ingestion_spark.operators.ann import (
    broadcast_near_dup_pairs,
)
from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    read_embeddings,
)
from crypto_near_real_time_data_ingestion_spark.streaming.stateful_emb import (
    run_emb_dedup_to_completion,
)
from crypto_near_real_time_data_ingestion_spark.streaming.stateful_lsh import (
    build_doc_stream_source,
)

WORK = "/tmp/spark_graft_stream_emb"


def _stream_pairs(spark, work, **kw) -> tuple[object, pd.DataFrame]:
    src = build_doc_stream_source(
        os.path.join(SF_DIR, "embeddings.parquet"),
        os.path.join(work, "source"),
        n_chunks=4,
        key_col="vec_id",
    )
    sink = run_emb_dedup_to_completion(
        spark, src, work, shuffle_partitions=8, **kw
    )
    got = (
        sink.read(spark)
        .select("vec_id_1", "vec_id_2", "cosine")
        .toPandas()
        .sort_values(["vec_id_1", "vec_id_2"])
        .reset_index(drop=True)
    )
    return sink, got


def _batch_pairs(spark) -> pd.DataFrame:
    return (
        broadcast_near_dup_pairs(read_embeddings(spark, SF_DIR))
        .toPandas()
        .sort_values(["vec_id_1", "vec_id_2"])
        .reset_index(drop=True)
    )


def test_streaming_emb_pairs_equal_batch_bitwise(spark):
    shutil.rmtree(WORK, ignore_errors=True)
    sink, got = _stream_pairs(spark, WORK)
    want = _batch_pairs(spark)
    assert len(want) > 0, "fixture must contain near-dup pairs"
    # bit-exact including the cosine doubles: same GEMM formula, same
    # rounding, so no tolerance is needed or wanted
    pd.testing.assert_frame_equal(got, want[got.columns])

    # exactly-once: a full re-run over the same work_dir replays nothing
    sink2, got2 = _stream_pairs(spark, WORK)
    assert len(got2) == len(got)


def test_shard_count_is_not_a_correctness_knob(spark):
    """Results are identical at any n_shards — sharding only distributes
    the state slices and the per-batch GEMM work."""
    frames = []
    for s in (2, 8):
        work = f"{WORK}_s{s}"
        shutil.rmtree(work, ignore_errors=True)
        _, got = _stream_pairs(spark, work, n_shards=s)
        frames.append(got)
        shutil.rmtree(work, ignore_errors=True)
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_chunk_count_is_not_a_correctness_knob(spark):
    """A single-chunk drain (every pair found by the in-batch GEMM
    path) equals the 4-chunk drain (most pairs found by the
    arrivals-vs-members path) — arrival batching only moves pairs
    between the two tiles, it cannot change the set or the values."""
    work = WORK + "_c1"
    shutil.rmtree(work, ignore_errors=True)
    src = build_doc_stream_source(
        os.path.join(SF_DIR, "embeddings.parquet"),
        os.path.join(work, "source"),
        n_chunks=1,
        key_col="vec_id",
    )
    sink = run_emb_dedup_to_completion(spark, src, work, shuffle_partitions=8)
    got = (
        sink.read(spark)
        .select("vec_id_1", "vec_id_2", "cosine")
        .toPandas()
        .sort_values(["vec_id_1", "vec_id_2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _batch_pairs(spark)[got.columns])
    shutil.rmtree(work, ignore_errors=True)


def test_bounded_index_is_exact_subset(spark):
    """max_members: a huge cap changes nothing; a tiny cap yields a
    SUBSET of the exact pairs, every survivor carrying the exact batch
    cosine (eviction loses future pairs, never fabricates or corrupts
    one)."""
    want = _batch_pairs(spark)
    want_keys = set(zip(want["vec_id_1"], want["vec_id_2"]))
    want_cos = {
        (a, b): c
        for a, b, c in zip(
            want["vec_id_1"], want["vec_id_2"], want["cosine"]
        )
    }
    for cap, expect_all in ((10_000, True), (1, False)):
        work = f"{WORK}_cap{cap}"
        shutil.rmtree(work, ignore_errors=True)
        _, got = _stream_pairs(spark, work, max_members=cap)
        keys = set(zip(got["vec_id_1"], got["vec_id_2"]))
        assert keys <= want_keys, "bounded index fabricated a pair"
        for a, b, c in zip(got["vec_id_1"], got["vec_id_2"], got["cosine"]):
            assert c == want_cos[(a, b)], "bounded index corrupted a cosine"
        if expect_all:
            assert keys == want_keys
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_emb_crash_mid_drain_resumes_exactly_once(spark):
    """Kill the sink mid-drain, restart from checkpoint: the state store
    (the corpus slices) rolls back with the crashed batch, so the
    restart neither double-inserts members nor drops the batch — the
    final pairs still bit-equal the batch plan."""
    import pytest

    from crypto_near_real_time_data_ingestion_spark.streaming.sinks import (
        ParquetMergeSink,
    )

    work = WORK + "_crash"
    shutil.rmtree(work, ignore_errors=True)
    src = build_doc_stream_source(
        os.path.join(SF_DIR, "embeddings.parquet"),
        os.path.join(work, "source"),
        n_chunks=4,
        key_col="vec_id",
    )
    orig = ParquetMergeSink.process_batch
    state = {"crashed": False}

    def crashing(self, df, batch_id):
        if batch_id >= 2 and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash mid-drain")
        return orig(self, df, batch_id)

    ParquetMergeSink.process_batch = crashing
    try:
        with pytest.raises(Exception):
            run_emb_dedup_to_completion(spark, src, work, shuffle_partitions=8)
    finally:
        ParquetMergeSink.process_batch = orig
    assert state["crashed"]

    sink = run_emb_dedup_to_completion(spark, src, work, shuffle_partitions=8)
    got = (
        sink.read(spark)
        .select("vec_id_1", "vec_id_2", "cosine")
        .toPandas()
        .sort_values(["vec_id_1", "vec_id_2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _batch_pairs(spark)[got.columns])
    shutil.rmtree(work, ignore_errors=True)
