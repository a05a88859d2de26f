"""Streaming incremental near-duplicate detection (stateful MinHash-LSH).

Continuous-ingestion dedup — the streaming form of the batch
``operators/text_dedup.minhash_lsh_pairs``: every arriving document is
checked against the ENTIRE accumulated corpus, and each verified
near-dup pair is emitted exactly once, in the micro-batch where its
later member arrives. This is the operation a 100 TB training-data
pipeline runs at the door: "is this incoming document a near-dup of
anything we already hold?" — without ever re-scanning the corpus.

Shape (the part that matters at scale):

  doc stream → shingle (Catalyst) → minhash bands (Arrow batch, the
  same vectorized Horner/splitmix hashing as batch LSH) → groupBy
  (band, band_hash) → applyInPandasWithState

The keyed state IS the LSH index, partitioned by band bucket — exactly
the structure production dedup services maintain, except here it lives
in Spark's state store (RocksDB at scale), is transactional with the
micro-batch (a crashed batch rolls the index back with it), and is
resumable from checkpoint. Per bucket the state holds each member's
sorted unique shingle-hash array; an arriving doc does ONE vectorized
membership pass (``np.isin`` + ``reduceat``) against the bucket's flat
array — cost ∝ bucket size, the same candidate-generation bound as the
batch band-bucket self-join. State grows with the corpus (16 bands ×
docs) because corpus dedup never forgets by definition; for unbounded
streams ``max_bucket_members`` caps each bucket at its most recent N
members (FIFO) — state becomes O(buckets × N) and the result degrades
predictably to dedup-against-the-recent-corpus (subset of the exact
pairs, never spurious ones).

Equivalence to batch: candidates are identical (same bands, same
buckets, same members once all docs arrived); verification computes the
same exact Jaccard — ``|∩|/|∪|`` over per-doc DISTINCT shingles — on
the 64-bit shingle hashes instead of the strings (equal unless two
distinct shingles of the same doc pair collide in 64 bits; the
equivalence test asserts exact equality including the jaccard doubles).
A pair emitted from several shared buckets in the same batch is
de-duplicated by the MERGE sink's (doc_id_1, doc_id_2) key; across
batches a pair can only emit once (its later member arrives once).
Arrival order does not matter: pairs are canonicalized (min, max), and
in-batch co-arrivals are processed in ascending doc_id order.

Reference parity: the reference has no streaming dedup; this extends
its batch glue-job dedup semantic (``silver_transform_job.py``
drop-duplicates) to the continuous regime the north star describes,
composed with the LSH family graded in ``doc_minhash_lsh``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.text_dedup import (
    N_BANDS,
    _band_hashes_batch,
    _batch_segments,
    _minhash_sigs_batch,
)

PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id_1", T.LongType()),
        T.StructField("doc_id_2", T.LongType()),
        T.StructField("jaccard", T.DoubleType()),
    ]
)

_BAND_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("sh_hashes", T.ArrayType(T.LongType())),
    ]
)

# bucket state: the LSH index shard for this (band, band_hash) —
# member doc ids, each member's shingle count, and the concatenation of
# all members' sorted unique shingle hashes (flat + lens = offsets)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("lens", T.ArrayType(T.IntegerType())),
        T.StructField("flat", T.ArrayType(T.LongType())),
    ]
)


def _bands_with_hashes_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per (doc × band) rows carrying the doc's sorted unique shingle
    hashes — the batch LSH band table plus the verification payload.
    One vectorized hashing pass per Arrow batch (shared with batch LSH);
    the per-segment sort is one flat lexsort over the batch."""
    for pdf in it:
        if len(pdf) == 0:
            continue
        hashes, seg_starts, seg_lens = _batch_segments(pdf["shingles"])
        sigs = _minhash_sigs_batch(hashes, seg_starts, seg_lens)
        bands = _band_hashes_batch(sigs)
        n = len(pdf)
        # sort hashes WITHIN each doc's segment: one lexsort over the
        # flat array keyed (segment, hash) — no per-doc Python sort
        seg_ids = np.repeat(np.arange(n, dtype=np.int64), seg_lens)
        order = np.lexsort((hashes.astype(np.int64), seg_ids))
        flat_sorted = hashes.astype(np.int64)[order]
        # object cells are the Arrow list-column representation
        per_doc = np.empty(n, dtype=object)
        bounds = np.concatenate(([0], np.cumsum(seg_lens)))
        for i in range(n):  # list-cell construction, not compute
            per_doc[i] = flat_sorted[bounds[i] : bounds[i + 1]]
        yield pd.DataFrame(
            {
                "band": np.tile(np.arange(N_BANDS, dtype=np.int32), n),
                "band_hash": bands.ravel(),
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(), N_BANDS),
                "sh_hashes": np.repeat(per_doc, N_BANDS),
            }
        )


def _process_bucket(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    threshold: float,
    max_members: int | None,
) -> Iterator[pd.DataFrame]:
    ids, lens, flat = state.get if state.exists else ([], [], [])
    m_ids = np.asarray(ids, dtype=np.int64)
    m_lens = np.asarray(lens, dtype=np.int64)
    m_flat = np.asarray(flat, dtype=np.int64)

    new_ids: list[np.ndarray] = []
    new_sets: list[np.ndarray] = []
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        new_ids.append(pdf["doc_id"].to_numpy())
        new_sets.extend(
            np.asarray(a, dtype=np.int64) for a in pdf["sh_hashes"]
        )
    if not new_ids:
        return
    arr_ids = np.concatenate(new_ids)
    order = np.argsort(arr_ids, kind="stable")  # in-batch ascending ids

    out1, out2, outj = [], [], []
    # per-ARRIVING-doc walk (bounded by this bucket's in-batch arrivals);
    # each step is one vectorized membership pass over all members —
    # the same ∝-bucket-size candidate bound as the batch bucket join
    for pos in order:
        d_id = int(arr_ids[pos])
        d_set = new_sets[pos]
        if len(m_ids) and len(d_set):
            starts = np.concatenate(([0], np.cumsum(m_lens)))[:-1]
            # .astype BEFORE reduceat: np.add.reduceat preserves dtype,
            # and add over bools is logical OR (every inter would cap at 1)
            inter = np.add.reduceat(
                np.isin(m_flat, d_set).astype(np.int64), starts
            )
            union = m_lens + len(d_set) - inter  # ≥ 1: segments non-empty
            jacc = inter / union
            sel = jacc >= threshold
            if sel.any():
                lo = np.minimum(m_ids[sel], d_id)
                hi = np.maximum(m_ids[sel], d_id)
                out1.extend(lo.tolist())
                out2.extend(hi.tolist())
                outj.extend(jacc[sel].tolist())
        m_ids = np.append(m_ids, d_id)
        m_lens = np.append(m_lens, len(d_set))
        m_flat = np.concatenate([m_flat, d_set]) if len(d_set) else m_flat

    if max_members is not None and len(m_ids) > max_members:
        # bounded-index regime: FIFO-evict the oldest members so state
        # is O(max_members) per bucket — dedup against the most recent
        # corpus slice instead of all history (the standard memory lever
        # for an unbounded stream; recall loss is exactly the evicted
        # members' future pairs)
        drop = len(m_ids) - max_members
        cut = int(m_lens[:drop].sum())
        m_ids, m_lens, m_flat = m_ids[drop:], m_lens[drop:], m_flat[cut:]

    state.update((m_ids.tolist(), m_lens.tolist(), m_flat.tolist()))
    if out1:
        yield pd.DataFrame(
            {"doc_id_1": out1, "doc_id_2": out2, "jaccard": outj}
        )


def lsh_pairs_stream(
    docs: DataFrame,
    threshold: float = 0.5,
    max_bucket_members: int | None = None,
) -> DataFrame:
    """Verified near-dup pairs over a streaming documents frame
    (doc_id, text). Emits each pair in the micro-batch where its later
    member arrives; duplicates across shared buckets are keyed out by a
    (doc_id_1, doc_id_2) MERGE sink.

    ``max_bucket_members``: None (default) = dedup against ALL history —
    exact batch equivalence, state ∝ corpus. An integer caps each
    bucket's index at the most recent N members (FIFO) — state is
    O(buckets × N) for an unbounded stream, and the emitted pairs are
    exactly the batch pairs minus those whose earlier member was evicted
    from every shared bucket before the later one arrived (pinned in
    tests: a subset, never a spurious pair)."""
    from ..plans.documents_gold import doc_shingles

    # shingle-less docs can never verify at any threshold > 0 (batch
    # drops them at verification: 0/0 → NULL jaccard); dropping them
    # BEFORE banding keeps every state segment non-empty (no reduceat
    # empty-trailing-segment hazard) and the emitted pairs identical
    sh = doc_shingles(docs).filter(F.size("shingles") > 0)
    bands = sh.mapInPandas(_bands_with_hashes_udf, schema=_BAND_SCHEMA)

    def fn(key, pdf_iter, state):
        return _process_bucket(
            key, pdf_iter, state, threshold, max_bucket_members
        )

    return bands.groupBy("band", "band_hash").applyInPandasWithState(
        fn,
        outputStructType=PAIRS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def build_doc_stream_source(
    docs_parquet: str, out_dir: str, n_chunks: int = 4
) -> str:
    """Chunk a documents parquet into an arrival-ordered file-stream
    source (one file per micro-batch at maxFilesPerTrigger=1) —
    deterministic: sorted by doc_id, contiguous slices."""
    import os
    import shutil

    import pyarrow.parquet as pq

    if os.path.isdir(out_dir) and sorted(os.listdir(out_dir)):
        return out_dir
    # stage + rename: a crash mid-write must not leave a partial chunk
    # set that a later run would silently reuse as the whole corpus
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    t = pq.read_table(docs_parquet).sort_by("doc_id")
    per = -(-t.num_rows // n_chunks)
    for i in range(n_chunks):
        chunk = t.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(tmp, f"part-{i:05d}.parquet"))
    os.rename(tmp, out_dir)
    return out_dir


def run_lsh_dedup_to_completion(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    threshold: float = 0.5,
    max_files_per_trigger: int = 1,
    shuffle_partitions: int | None = None,
    max_bucket_members: int | None = None,
):
    """Drain the doc stream through the stateful LSH index into an
    exactly-once MERGE sink keyed (doc_id_1, doc_id_2); returns the sink.
    Resumable: a re-run over the same work_dir is a no-op (checkpoint +
    per-batch sink commit log), and the state store rolls back with a
    crashed batch so the index never double-inserts.

    ``shuffle_partitions``: state stores commit per partition per batch —
    pass a small value for verification-scale drains (same rationale and
    measurement as ``engine.run_pipeline_to_completion``); production
    streams size it to bucket-state volume as usual. Restored after."""
    import os

    from .sinks import ParquetMergeSink

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    sink = ParquetMergeSink(
        os.path.join(work_dir, "tables", "lsh_pairs"),
        ["doc_id_1", "doc_id_2"],
        None,
    )
    try:
        q = (
            lsh_pairs_stream(src, threshold, max_bucket_members)
            .writeStream.queryName("lsh_pairs")
            .outputMode("update")
            .option(
                "checkpointLocation",
                os.path.join(work_dir, "checkpoints", "lsh_pairs"),
            )
            .foreachBatch(sink.foreach_batch_handler())
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sink
