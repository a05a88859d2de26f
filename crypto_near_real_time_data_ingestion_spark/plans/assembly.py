"""End-to-end dataset assembly: the capstone composition.

Every stage of the training-data pipeline exists and is individually
oracle-checked (curation, decontamination, near-dup clustering, split,
tokenizer training, encoding, packing, dataset card); this module is
the proof they COMPOSE — one call takes the raw documents table to the
released artifact set a training run consumes:

  1. curation        doc_curation_kept     (langid ∧ quality ∧ exact-canonical)
  2. decontamination doc_decontaminate     (drop flagged; the md5-byte
                                            eval holdout — the benchmark
                                            stand-in — never releases)
  3. near-dup dedup  doc_dup_clusters      (one representative per
                                            cluster among the remaining:
                                            min doc_id — deterministic)
  4. split           doc_split_assign      (hash-keyed 80/10/10)
  5. tokenizer       bpe_train             (TRAIN split only: merges
                                            must not see val/test — the
                                            tokenizer-side leakage rule)
  6. encode          bpe_encode            (every released doc)
  7. packing         doc_pack_sequences    (fixed-budget sequences)
  8. dataset card    doc_corpus_stats      (per-stratum rollup)

Filter order matters and is part of the contract: decontamination runs
BEFORE representative selection, so a cluster whose cheapest member is
contaminated still releases its cleanest member instead of vanishing.

Scale shape: nothing here adds a new distributed primitive — the
composition inherits each stage's shape (broadcast semi-joins, banded
LSH, hash splits, vocabulary-sized BPE loop, bucketed packing). The
released-id manifest (``reps``) is eagerly localCheckpoint'd because
five downstream stages fan out from it — at production scale that
manifest is a written table, not a lineage node.

Reference parity: the reference ends at gold feature tables
(``gold_features_base_job.py``); this is the corresponding "publish the
dataset" terminal stage for the corpus modality the north star adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.bpe import bpe_encode, bpe_train
from ..operators.clusters import doc_dup_clusters
from ..operators.fingerprint import dataset_fingerprint
from .documents_gold import (
    PACK_BUDGET,
    doc_corpus_stats,
    doc_curation_kept,
    doc_decontaminate,
    doc_pack_sequences,
    doc_split_assign,
)


def assemble_dataset(
    docs: DataFrame,
    n_merges: int = 12,
    pack_budget: int = PACK_BUDGET,
    n_buckets: int = 8,
) -> dict:
    """Run the full assembly pipeline; returns the released artifacts:

    ``survivors`` (the released documents, full rows), ``splits``
    (doc_id → train/val/test), ``merges`` (the learned BPE table, a
    driver-side list), ``tokens`` (doc_id → BPE token sequence),
    ``packed`` (chunk → fixed-budget training sequence assignment),
    ``card`` (the per-stratum dataset card), ``fingerprint`` (the
    order/partition/engine-invariant content hash of the released ids —
    the release-manifest identity a rerun or a second engine must
    reproduce; ``operators/fingerprint.py``)."""
    kept = doc_curation_kept(docs).select("doc_id")
    # decontaminate covers the train-side docs only; the eval holdout
    # slice is absent from its output, so this join also drops it
    clean = (
        doc_decontaminate(docs)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    clean_kept = kept.join(clean, "doc_id")
    clusters = doc_dup_clusters(docs).select("doc_id", "cluster_id")
    reps = (
        clean_kept.join(clusters, "doc_id")
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .localCheckpoint()  # the released-id manifest: 5 consumers
    )
    survivors = docs.join(reps, "doc_id")
    splits = doc_split_assign(survivors).select("doc_id", "split")
    train_docs = survivors.join(
        splits.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    merges = bpe_train(train_docs, n_merges=n_merges)
    tokens = bpe_encode(survivors, merges)
    packed = doc_pack_sequences(
        survivors, budget=pack_budget, n_buckets=n_buckets
    )
    card = doc_corpus_stats(survivors)
    # hash the checkpointed released-id manifest, not survivors: the id
    # sets are identical (survivors = docs ⋈ reps) and reps skips the
    # redundant full-docs scan+join this eager collect would re-run
    fp = dataset_fingerprint(reps, ["doc_id"]).collect()[0]
    return {
        "survivors": survivors,
        "splits": splits,
        "merges": merges,
        "tokens": tokens,
        "packed": packed,
        "card": card,
        "fingerprint": (fp["n_rows"], fp["fingerprint"]),
    }
