"""Streaming Bloom decontamination gate: row-identical to the batch op
over the same corpus, flags actually fire, holdout never enters the
gate's output, and a re-run over the same work_dir replays nothing."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal

from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    DECONTAM_EVAL_BYTE_MIN,
    _md5_byte,
    doc_decontaminate_bloom,
    read_documents,
)
from crypto_near_real_time_data_ingestion_spark.streaming.decontam import (
    run_decontam_gate_to_completion,
)
from crypto_near_real_time_data_ingestion_spark.streaming.stateful_lsh import (
    build_doc_stream_source,
)

WORK = "/tmp/spark_graft_stream_decontam"


def test_streaming_gate_equals_batch_and_is_exactly_once(spark):
    shutil.rmtree(WORK, ignore_errors=True)
    docs_parquet = os.path.join(SF_DIR, "documents.parquet")
    src = build_doc_stream_source(
        docs_parquet, os.path.join(WORK, "source"), n_chunks=4
    )
    out = run_decontam_gate_to_completion(spark, docs_parquet, src, WORK)

    got = spark.read.parquet(out)
    want = doc_decontaminate_bloom(read_documents(spark, SF_DIR)).toPandas()
    assert_df_equal(got, want, sort_cols=["doc_id"])

    # semantics through the stream: flags fire (the corpus plants
    # leaks), and no holdout doc appears in the gate's output
    assert 0 < got.filter("contaminated").count() < got.count()
    assert (
        got.join(
            read_documents(spark, SF_DIR)
            .filter(_md5_byte(F.col("doc_id")) >= DECONTAM_EVAL_BYTE_MIN)
            .select("doc_id"),
            "doc_id",
        ).count()
        == 0
    )

    # exactly-once: a full re-run over the same work_dir replays nothing
    before = got.count()
    out2 = run_decontam_gate_to_completion(spark, docs_parquet, src, WORK)
    assert spark.read.parquet(out2).count() == before


def test_gate_refuses_empty_corpus_slice(spark):
    """eval_byte_min >= 256 with no external bitmap would build an
    all-zero bitmap (md5 bytes are 0-255) and silently pass every
    leaked doc — the runner refuses it loudly (r5 review)."""
    import pytest

    from crypto_near_real_time_data_ingestion_spark.streaming.decontam import (
        run_decontam_gate_to_completion,
    )

    with pytest.raises(ValueError, match="EMPTY corpus eval slice"):
        run_decontam_gate_to_completion(
            spark, "/nonexistent.parquet", "/nonexistent", "/tmp/x",
            eval_byte_min=256,
        )
