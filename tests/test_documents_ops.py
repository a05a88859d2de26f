"""Documents/embeddings pipeline ops: exact plans vs oracle; approximate
ops (MinHash-LSH, SimHash, LSH-ANN) vs exact ground truth (recall)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal, duck_sql
from crypto_near_real_time_data_ingestion_spark.operators.ann import (
    ivf_ann_topk,
    lsh_ann_topk,
)
from crypto_near_real_time_data_ingestion_spark.operators.multimodal import (
    documents_as_media,
    extract_media_features,
    frame_sample,
    resize_media,
)
from crypto_near_real_time_data_ingestion_spark.operators.text_dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
    winnow_fingerprints,
)
from crypto_near_real_time_data_ingestion_spark.plans import documents_gold as dg


def _docs(spark):
    return dg.read_documents(spark, SF_DIR)


def _emb(spark):
    return dg.read_embeddings(spark, SF_DIR)


def test_doc_exact_dedup(spark):
    got = dg.doc_exact_dedup(_docs(spark))
    want = duck_sql(dg.DOC_EXACT_DEDUP_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["text_md5"])


def test_doc_text_stats(spark):
    got = dg.doc_text_stats(_docs(spark))
    want = duck_sql(dg.DOC_TEXT_STATS_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["doc_id"], rtol=0)


def test_doc_langid(spark):
    got = dg.doc_langid(_docs(spark))
    want = duck_sql(dg.DOC_LANGID_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_doc_ngram_jaccard(spark):
    got = dg.doc_ngram_jaccard_pairs(_docs(spark))
    want = duck_sql(dg.DOC_JACCARD_ORACLE_SQL_TEMPLATE.format(threshold=0.5))
    assert_df_equal(got, want, sort_cols=["doc_id_1", "doc_id_2"], rtol=0)


def test_emb_cosine_topk(spark):
    got = dg.emb_cosine_topk(_emb(spark), k=5)
    want = duck_sql(dg.EMB_TOPK_ORACLE_SQL_TEMPLATE.format(k=5))
    assert_df_equal(got, want, sort_cols=["vec_id", "rank"])


def test_emb_near_dup(spark):
    got = dg.emb_near_dup_pairs(_emb(spark), threshold=0.45)
    want = duck_sql(dg.EMB_NEAR_DUP_ORACLE_SQL_TEMPLATE.format(threshold=0.45))
    assert_df_equal(got, want, sort_cols=["vec_id_1", "vec_id_2"])


# --- approximate ops vs exact ground truth ---------------------------------

def test_minhash_lsh_recall(spark):
    """Verified MinHash-LSH pairs == exact Jaccard pairs (threshold 0.5):
    candidates ⊇ true pairs (recall 1.0 on this corpus), verification
    removes false positives."""
    docs = _docs(spark)
    exact = {
        (r.doc_id_1, r.doc_id_2)
        for r in dg.doc_ngram_jaccard_pairs(docs, 0.5).collect()
    }
    approx = {
        (r.doc_id_1, r.doc_id_2) for r in minhash_lsh_pairs(docs, 0.5).collect()
    }
    assert exact, "corpus should contain planted near-dups"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"minhash recall {recall}"
    assert approx <= exact, "verified pairs must all satisfy the exact threshold"


def test_simhash_pairs_are_near_dups(spark):
    docs = _docs(spark)
    exact = {
        (r.doc_id_1, r.doc_id_2)
        for r in dg.doc_ngram_jaccard_pairs(docs, 0.3).collect()
    }
    sim = {(r.doc_id_1, r.doc_id_2) for r in simhash_pairs(docs, 3).collect()}
    # simhash(hamming<=3) is a high-precision detector: its pairs should be
    # genuinely similar documents
    assert sim, "expected some simhash pairs on a corpus with planted dups"
    precision = len(sim & exact) / len(sim)
    assert precision >= 0.9, f"simhash precision {precision}"


def test_winnow_fingerprints_shape(spark):
    fp = winnow_fingerprints(_docs(spark))
    row = fp.filter(F.size("fingerprints") > 0).first()
    assert row is not None
    # deterministic across runs
    fp2 = winnow_fingerprints(_docs(spark))
    assert (
        fp.orderBy("doc_id").collect() == fp2.orderBy("doc_id").collect()
    )


def test_lsh_ann_recall(spark):
    emb = _emb(spark)
    exact = dg.emb_cosine_topk(emb, k=5).toPandas()
    approx = lsh_ann_topk(emb, k=5).toPandas()
    e = exact.groupby("vec_id")["neighbor_id"].apply(set)
    a = approx.groupby("vec_id")["neighbor_id"].apply(set)
    recalls = [
        len(e[v] & a.get(v, set())) / len(e[v]) for v in e.index
    ]
    mean_recall = sum(recalls) / len(recalls)
    # this corpus has NO genuinely-near neighbors (max cosine ≈ 0.51, ~60°
    # angles) — the worst case for hyperplane LSH; with real near-dup
    # clusters bucket recall ≈ 1. 0.6 reflects the far-neighbor regime.
    assert mean_recall >= 0.6, f"ANN mean recall@5 {mean_recall}"


def test_ivf_ann_recall(spark):
    emb = _emb(spark)
    exact = dg.emb_cosine_topk(emb, k=5).toPandas()
    approx = ivf_ann_topk(emb, k=5).toPandas()
    e = exact.groupby("vec_id")["neighbor_id"].apply(set)
    a = approx.groupby("vec_id")["neighbor_id"].apply(set)
    recalls = [len(e[v] & a.get(v, set())) / len(e[v]) for v in e.index]
    mean_recall = sum(recalls) / len(recalls)
    # same far-neighbor corpus caveat as the LSH test above; nprobe=4 of
    # 16 cells scans ~25% of the corpus per query
    assert mean_recall >= 0.6, f"IVF mean recall@5 {mean_recall}"
    # determinism: centroid fit is seeded by construction (id-ordered
    # sample, fixed init) — two runs must agree exactly
    again = ivf_ann_topk(emb, k=5).toPandas()
    assert approx.sort_values(["vec_id", "rank"]).reset_index(drop=True).equals(
        again.sort_values(["vec_id", "rank"]).reset_index(drop=True)
    )


def test_media_features(spark):
    media = documents_as_media(_docs(spark))
    feats = extract_media_features(media)
    pdf = feats.toPandas()
    assert len(pdf) == media.count()
    assert set(pdf["media_type"]) <= {"image", "audio", "video"}
    assert (pdf["n_bytes"] > 0).all()
    assert pdf["byte_entropy"].between(0, 8).all()
    # deterministic
    pdf2 = extract_media_features(media).toPandas()
    key = ["media_id"]
    assert pdf.sort_values(key).reset_index(drop=True).equals(
        pdf2.sort_values(key).reset_index(drop=True)
    )


def test_media_resize_and_frame_sample(spark):
    media = documents_as_media(_docs(spark))
    resized = resize_media(media, width=32, height=32).toPandas()
    assert len(resized) == media.filter("media_type = 'image'").count()
    assert (resized["n_bytes"] == 32 * 32).all()
    assert resized["payload"].map(len).eq(32 * 32).all()

    frames = frame_sample(media, every_n=4, frame_bytes=64).toPandas()
    n_videos = media.filter("media_type = 'video'").count()
    assert frames["media_id"].nunique() == n_videos
    # 1:N explosion — at least one video yields multiple sampled frames
    assert (frames.groupby("media_id").size() >= 1).all()
    assert (frames["frame_idx"] % 4 == 0).all()
    assert (frames["n_bytes"] <= 64).all() and (frames["n_bytes"] > 0).all()


def test_broadcast_cosine_topk_matches_exact(spark):
    from crypto_near_real_time_data_ingestion_spark.operators.ann import (
        broadcast_cosine_topk,
    )

    emb = _emb(spark)
    got = broadcast_cosine_topk(emb, k=5)
    want = dg.emb_cosine_topk(emb, k=5).toPandas()
    assert_df_equal(got, want, sort_cols=["vec_id", "rank"])
