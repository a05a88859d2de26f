"""Streaming decontamination gate: stream-static Bloom probe at ingest.

Batch decontamination (``doc_decontaminate_bloom``) re-scans the corpus
after the fact; at a continuously-ingested corpus the cheaper place for
the check is the ingest path itself — every arriving TRAIN-side document
is probed against the (static) eval/benchmark bitmap IN the micro-batch
that delivers it, so contaminated docs are flagged before they ever
reach a training shard.

Scope of the output (same contract as the batch op): only train-side
docs — ``hash_byte < eval_byte_min`` — appear in the flags sink; the
eval slice itself is neither probed nor emitted (it is the REFERENCE,
not a candidate). With the default ``eval_byte_min`` this mirrors the
batch same-corpus md5-slice convention; when the bitmap comes from a
genuinely EXTERNAL benchmark (``build_eval_bitmap`` over any eval
frame), pass ``eval_byte_min=256`` so every arriving doc is probed and
emitted — otherwise ~(256−eval_byte_min)/256 of arrivals would silently
skip the gate.

Scale shape: the bitmap is a driver-side int64 array bounded by
m_bits/64 REGARDLESS of reference-set size (the Bloom trade), broadcast
once; the per-batch work is the same map-only shingle + vectorized
membership-count stage the batch op runs (shared function —
``plans.documents_gold.bloom_overlap_flags`` — so stream/batch equality
is structural). No keyed state, no watermark, no shuffle: the gate adds
zero stateful operators to the ingest pipeline, and the parquet sink's
``_spark_metadata`` transaction log makes the append exactly-once.

One-sided error inherited from the batch op: false positives only
(clean docs may be dropped at the configured FPP; leaked eval content
is never missed) — the safe direction for decontamination.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.documents_gold import (
    DECONTAM_EVAL_BYTE_MIN,
    DECONTAM_THRESHOLD,
    _md5_byte,
    bloom_overlap_flags,
    doc_shingles,
)


def build_eval_bitmap(
    eval_docs: DataFrame, n: int = 3, m_bits: int = 1 << 20, k: int = 5
):
    """Bitmap over an eval corpus's distinct shingles (the static side
    of the gate). ``eval_docs`` is whatever defines the holdout — here
    the md5-slice convention the batch op uses."""
    from ..operators.bloom import build_bloom

    grams = (
        doc_shingles(eval_docs, n)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    return build_bloom(grams, "s", m_bits, k)


def run_decontam_gate_to_completion(
    spark: SparkSession,
    docs_parquet: str,
    source_dir: str,
    work_dir: str,
    n: int = 3,
    threshold: float = DECONTAM_THRESHOLD,
    eval_byte_min: int = DECONTAM_EVAL_BYTE_MIN,
    m_bits: int = 1 << 20,
    k: int = 5,
    max_files_per_trigger: int = 1,
    words=None,
) -> str:
    """Drain the chunked doc stream (``stateful_lsh.build_doc_stream_
    source``) through the Bloom gate into an exactly-once parquet sink;
    returns the sink path. The bitmap is built once, batch-side, from
    the SAME corpus's eval slice (mirroring the batch op, so the two
    are row-comparable); a re-run over the same work_dir replays
    nothing (file-source checkpoint + file-sink transaction log).
    For an external-benchmark bitmap, pass it as ``words`` (a
    ``build_eval_bitmap``/``build_bloom`` word array built under the
    SAME (m_bits, k)) together with ``eval_byte_min=256`` so every
    arriving doc is probed and emitted. The runner refuses the
    footgun of ``eval_byte_min >= 256`` WITHOUT an external bitmap:
    md5 bytes are 0-255, so the corpus eval slice would be empty and
    the gate would silently pass every leaked doc."""
    if words is None and eval_byte_min >= 256:
        raise ValueError(
            "eval_byte_min >= 256 selects an EMPTY corpus eval slice "
            "(md5 bytes are 0-255) — the gate would be an all-pass "
            "no-op. Pass an external bitmap via words= for "
            "external-benchmark decontamination."
        )
    batch_docs = spark.read.parquet(docs_parquet)
    if words is None:
        words = build_eval_bitmap(
            batch_docs.filter(_md5_byte(F.col("doc_id")) >= eval_byte_min),
            n, m_bits, k,
        )
    stream = (
        spark.readStream.schema(batch_docs.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    flagged = bloom_overlap_flags(
        stream, words, n, threshold, eval_byte_min, m_bits, k
    )
    out = os.path.join(work_dir, "flags")
    q = (
        flagged.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(work_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out
