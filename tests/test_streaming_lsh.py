"""Streaming incremental LSH dedup == batch MinHash-LSH pairs.

The stateful LSH index (`streaming/stateful_lsh.py`) fed the corpus as
an arrival-ordered stream must emit exactly the pairs the batch
`minhash_lsh_pairs` finds over the same corpus — same candidates (same
bands/buckets once all docs arrived), same exact-Jaccard verification
values (int-hash sets vs string sets: equal absent 64-bit collisions,
asserted exactly here) — and a re-run over the same work_dir must be a
no-op (checkpoint + sink commit log).
"""

from __future__ import annotations

import os
import shutil

from conftest import SF_DIR, assert_df_equal
from crypto_near_real_time_data_ingestion_spark.operators.text_dedup import (
    minhash_lsh_pairs,
)
from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    read_documents,
)
from crypto_near_real_time_data_ingestion_spark.streaming.stateful_lsh import (
    build_doc_stream_source,
    run_lsh_dedup_to_completion,
)

WORK = "/tmp/spark_graft_stream_lsh"


def test_streaming_lsh_pairs_equal_batch(spark):
    shutil.rmtree(WORK, ignore_errors=True)
    src = build_doc_stream_source(
        os.path.join(SF_DIR, "documents.parquet"),
        os.path.join(WORK, "source"),
        n_chunks=4,
    )
    sink = run_lsh_dedup_to_completion(spark, src, WORK)

    got = sink.read(spark).select("doc_id_1", "doc_id_2", "jaccard")
    want = minhash_lsh_pairs(read_documents(spark, SF_DIR)).toPandas()
    assert len(want) > 0, "fixture must contain near-dup pairs"
    assert_df_equal(got, want, sort_cols=["doc_id_1", "doc_id_2"])

    # exactly-once: a full re-run over the same work_dir replays nothing
    before = got.count()
    sink2 = run_lsh_dedup_to_completion(spark, src, WORK)
    assert sink2.read(spark).count() == before


def test_bounded_index_is_exact_subset(spark):
    """max_bucket_members: a large cap changes nothing (no bucket ever
    evicts → identical to unbounded); a tiny cap yields a SUBSET of the
    exact pairs — every emitted pair still carries the exact batch
    jaccard (eviction can only lose pairs, never fabricate or corrupt
    one)."""
    want = minhash_lsh_pairs(read_documents(spark, SF_DIR)).toPandas()
    want_keys = set(zip(want["doc_id_1"], want["doc_id_2"]))
    want_j = {
        (a, b): j
        for a, b, j in zip(want["doc_id_1"], want["doc_id_2"], want["jaccard"])
    }

    for cap, expect_all in ((10_000, True), (1, False)):
        work = f"{WORK}_cap{cap}"
        shutil.rmtree(work, ignore_errors=True)
        src = build_doc_stream_source(
            os.path.join(SF_DIR, "documents.parquet"),
            os.path.join(work, "source"),
            n_chunks=4,
        )
        sink = run_lsh_dedup_to_completion(
            spark, src, work, max_bucket_members=cap
        )
        got = sink.read(spark).select("doc_id_1", "doc_id_2", "jaccard").toPandas()
        keys = set(zip(got["doc_id_1"], got["doc_id_2"]))
        assert keys <= want_keys, "bounded index fabricated a pair"
        for a, b, j in zip(got["doc_id_1"], got["doc_id_2"], got["jaccard"]):
            assert j == want_j[(a, b)], "bounded index corrupted a jaccard"
        if expect_all:
            assert keys == want_keys
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_lsh_crash_mid_drain_resumes_exactly_once(spark):
    """Kill the sink mid-drain, restart from checkpoint: the state store
    (the LSH index) rolls back with the crashed batch, so the restart
    neither double-inserts index members (which would double-emit pairs)
    nor drops the batch — the final pairs still equal the batch plan."""
    import pytest

    from crypto_near_real_time_data_ingestion_spark.streaming.sinks import (
        ParquetMergeSink,
    )

    work = WORK + "_crash"
    shutil.rmtree(work, ignore_errors=True)
    src = build_doc_stream_source(
        os.path.join(SF_DIR, "documents.parquet"),
        os.path.join(work, "source"),
        n_chunks=4,
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
            run_lsh_dedup_to_completion(spark, src, work)
    finally:
        ParquetMergeSink.process_batch = orig
    assert state["crashed"]

    sink = run_lsh_dedup_to_completion(spark, src, work)
    got = sink.read(spark).select("doc_id_1", "doc_id_2", "jaccard")
    want = minhash_lsh_pairs(read_documents(spark, SF_DIR)).toPandas()
    assert_df_equal(got, want, sort_cols=["doc_id_1", "doc_id_2"])
