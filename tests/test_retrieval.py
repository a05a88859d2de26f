"""Hybrid RRF retrieval: DuckDB value oracle (exact — integer lexical
ranks + round6 cosine ranks), planted fusion semantics (both-pool docs
beat single-pool docs at the same ranks, absent ranks surface as 0,
RRF weight decays with rank), pool bounding, and the BM25-scored
variant's consistency with its own rankers."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.operators.bm25 import bm25_score
from crypto_near_real_time_data_ingestion_spark.operators.retrieval import (
    RRF_K,
    hybrid_rrf_oracle_sql,
    hybrid_rrf_topk,
    lexical_tf_score,
    rrf_fuse,
    semantic_query_scores,
)
from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    read_documents,
)

QUERY = ["spark", "merge", "window"]
QVEC = 0


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_hybrid_rrf_matches_duckdb_oracle(spark):
    docs = read_documents(spark, SF_DIR)
    for terms, qv, k, pool in ((QUERY, QVEC, 20, 100), (["scan"], 7, 10, 25)):
        got = hybrid_rrf_topk(docs, _emb(spark), terms, qv, k=k, pool=pool)
        want = duck_sql(hybrid_rrf_oracle_sql(terms, qv, k=k, pool=pool))
        assert got.count() == k  # non-vacuous: the pools fill the top-k
        assert_df_equal(got, want, sort_cols=["doc_id"])


def test_rrf_planted_fusion_semantics(spark):
    """Hand-built rank frames: a doc ranked 3rd by BOTH rankers must
    fuse above a doc ranked 1st by only one (1/63+1/63 > 1/61); absent
    ranks surface as 0; fused order breaks ties by doc_id."""
    lex = spark.createDataFrame(
        [(10, 1), (30, 2), (50, 3)], "doc_id long, rank_lex long"
    )
    sem = spark.createDataFrame(
        [(20, 1), (40, 2), (50, 3)], "doc_id long, rank_sem long"
    )
    out = rrf_fuse(lex, sem, k=10).toPandas().set_index("doc_id")
    # both-pool doc 50 (rank 3+3) beats every single-pool doc incl. rank-1s
    assert out["rrf_score"].idxmax() == 50
    assert out.loc[50, "rrf_score"] == pytest.approx(
        round(2 / (RRF_K + 3), 6), abs=1e-12  # op emits round6 scores
    )
    # absent ranks are 0, never NULL
    assert out.loc[10, "rank_sem"] == 0 and out.loc[20, "rank_lex"] == 0
    # single-pool ordering follows rank (1/(K+1) > 1/(K+2))
    assert out.loc[10, "rrf_score"] > out.loc[30, "rrf_score"]
    # equal-score tie (10 vs 20, both rank-1 singles) -> doc_id ascending
    rows = rrf_fuse(lex, sem, k=10).toPandas()
    i10 = rows.index[rows.doc_id == 10][0]
    i20 = rows.index[rows.doc_id == 20][0]
    assert i10 < i20


def test_lexical_tf_score_counts_occurrences(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple zebra"),
            (3, "nothing relevant"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["tf_total"]
        for r in lexical_tf_score(docs, ["apple", "banana"]).collect()
    }
    assert got == {1: 3, 2: 1}  # non-matching + null-text docs absent


def test_semantic_query_scores_shape(spark):
    emb = _emb(spark)
    n = emb.count()
    sem = semantic_query_scores(emb, QVEC)
    assert sem.count() == n - 1  # query excluded
    pdf = sem.toPandas()
    assert pdf["cosine"].between(-1.0, 1.0).all()
    # self-consistency vs numpy on a sample row
    mat = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in emb.limit(50).collect()}
    q = mat[QVEC]
    for vid, v in list(mat.items())[:5]:
        if vid == QVEC:
            continue
        want = float(q @ v / np.sqrt((q @ q) * (v @ v)))
        got = float(pdf.loc[pdf.vec_id == vid, "cosine"].iloc[0])
        assert got == pytest.approx(want, abs=2e-6)


def test_pool_bounds_candidates(spark):
    """pool smaller than the match count truncates each ranker's
    candidates — fused results only ever come from the pools."""
    docs = read_documents(spark, SF_DIR)
    out = hybrid_rrf_topk(docs, _emb(spark), QUERY, QVEC, k=50, pool=5)
    pdf = out.toPandas()
    assert len(pdf) <= 10  # ≤ 2 pools of 5
    assert ((pdf.rank_lex <= 5) & (pdf.rank_sem <= 5)).all()


def test_bm25_scored_variant_consistent(spark):
    """lex_scorer='bm25' fuses the SAME doc set as ranking bm25_score
    directly (float venue — rank agreement, not value hash)."""
    docs = read_documents(spark, SF_DIR)
    out = hybrid_rrf_topk(
        docs, _emb(spark), QUERY, QVEC, k=15, pool=30, lex_scorer="bm25"
    ).toPandas()
    top_lex = (
        bm25_score(docs, QUERY)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(30)
        .toPandas()["doc_id"]
        .tolist()
    )
    lex_docs = set(out.loc[out.rank_lex > 0, "doc_id"])
    assert lex_docs <= set(top_lex)
    with pytest.raises(ValueError):
        hybrid_rrf_topk(docs, _emb(spark), QUERY, QVEC, lex_scorer="nope")
    with pytest.raises(ValueError):
        hybrid_rrf_topk(docs, _emb(spark), [], QVEC)
