"""The dataset-assembly capstone: the stages compose, and the composed
contract holds end-to-end — released docs are curated ∧ clean ∧
cluster-unique ∧ never from the eval holdout; the tokenizer saw only
the train split; packing and the card cover exactly the released set.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from conftest import SF_DIR
from crypto_near_real_time_data_ingestion_spark.operators.bpe import bpe_train
from crypto_near_real_time_data_ingestion_spark.operators.clusters import (
    doc_dup_clusters,
)
from crypto_near_real_time_data_ingestion_spark.plans.assembly import (
    assemble_dataset,
)
from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    DECONTAM_EVAL_BYTE_MIN,
    doc_curation_kept,
    doc_decontaminate,
    read_documents,
)

N_MERGES = 8


def _hb(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16)


def test_assemble_dataset_end_to_end(spark):
    docs = read_documents(spark, SF_DIR)
    res = assemble_dataset(docs, n_merges=N_MERGES)
    ids = {r["doc_id"] for r in res["survivors"].select("doc_id").collect()}
    assert len(ids) > 0

    # 1. released ⊆ curation-kept
    kept = {r["doc_id"] for r in doc_curation_kept(docs).select("doc_id").collect()}
    assert ids <= kept
    # non-vacuity: decontamination + dedup actually removed kept docs
    assert ids < kept

    # 2. no contaminated doc and nothing from the eval holdout slice
    decon = doc_decontaminate(docs).toPandas().set_index("doc_id")
    for d in ids:
        assert _hb(d) < DECONTAM_EVAL_BYTE_MIN, f"holdout doc {d} released"
        assert not decon.loc[d, "contaminated"], f"contaminated doc {d} released"

    # 3. cluster-unique, and every cluster owning a clean kept member
    # released exactly its MIN clean-kept member
    clusters = doc_dup_clusters(docs).toPandas()
    cid = clusters.set_index("doc_id")["cluster_id"].to_dict()
    released_clusters = [cid[d] for d in ids]
    assert len(released_clusters) == len(set(released_clusters)), "near-dups released"
    clean_kept = {
        d for d in kept
        if _hb(d) < DECONTAM_EVAL_BYTE_MIN and not decon.loc[d, "contaminated"]
    }
    want_reps = {}
    for d in clean_kept:
        want_reps[cid[d]] = min(want_reps.get(cid[d], d), d)
    assert ids == set(want_reps.values())

    # 4. split covers the released set exactly
    splits = res["splits"].toPandas()
    assert set(splits["doc_id"]) == ids
    assert set(splits["split"]) <= {"train", "val", "test"}

    # 5. tokenizer-side leakage rule: merges re-derivable from the TRAIN
    # split alone through the public op
    train_ids = set(splits[splits["split"] == "train"]["doc_id"])
    assert 0 < len(train_ids) < len(ids)
    train_docs = docs.join(
        spark.createDataFrame([(d,) for d in train_ids], "doc_id long"), "doc_id"
    )
    assert res["merges"] == bpe_train(train_docs, n_merges=N_MERGES)
    assert len(res["merges"]) == N_MERGES

    # 6. every released doc has a token row; no outsider does
    toks = res["tokens"].toPandas()
    assert set(toks["doc_id"]) == ids
    assert (toks["tokens"].map(len) > 0).all()  # curated docs have words

    # 7. packing references exactly the released docs and respects the
    # contiguous-fill bound (budget + one unsplit chunk — the op's own
    # invariant, re-checked through the composition)
    packed = res["packed"].toPandas()
    assert set(packed["doc_id"]) == ids
    per_pack = packed.groupby(["bucket", "pack_id"])["n_tokens"].sum()
    from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
        CHUNK_SIZE,
        PACK_BUDGET,
    )
    assert (per_pack < PACK_BUDGET + CHUNK_SIZE).all()

    # 8. the card covers exactly the released set
    card = res["card"].toPandas()
    assert card["n_docs"].sum() == len(ids)

    # 9. the release fingerprint is reproducible and id-derived: a rerun
    # stamps the identical (n_rows, hash), and it matches the standalone
    # op over the released ids
    from crypto_near_real_time_data_ingestion_spark.operators.fingerprint import (
        dataset_fingerprint,
    )

    n, fp = res["fingerprint"]
    assert n == len(ids)
    want_fp = dataset_fingerprint(
        res["survivors"].select("doc_id"), ["doc_id"]
    ).collect()[0]
    assert (n, fp) == (want_fp["n_rows"], want_fp["fingerprint"])
    res2 = assemble_dataset(docs, n_merges=N_MERGES)
    assert res2["fingerprint"] == (n, fp)


def test_assemble_dataset_empty_corpus(spark):
    """A curation config that filters everything is a routine production
    event: every stage must degrade to its empty artifact — no stage may
    crash on an empty upstream (kmeans-less pipeline, empty merge table,
    (0, 0) fingerprint)."""
    from pyspark.sql import DataFrame

    docs = spark.createDataFrame(
        [], "doc_id long, source string, lang string, text string"
    )
    res = assemble_dataset(docs, n_merges=4)
    counts = {
        k: (v.count() if isinstance(v, DataFrame) else v)
        for k, v in res.items()
    }
    assert counts == {
        "survivors": 0,
        "splits": 0,
        "merges": [],
        "tokens": 0,
        "packed": 0,
        "card": 0,
        "fingerprint": (0, 0),
    }
