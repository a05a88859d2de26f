"""BM25 lexical retrieval: DuckDB value oracle (float-tolerance venue),
planted-fixture semantics (tf monotone + saturating, rare-term IDF
dominance, non-matching docs absent), and topk/score consistency."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.operators.bm25 import (
    BM25_K1,
    bm25_oracle_sql,
    bm25_score,
    bm25_topk,
)
from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    read_documents,
)


def test_bm25_matches_duckdb_oracle(spark):
    docs = read_documents(spark, SF_DIR)
    for q in (["scan", "dup", "merge"], ["window"]):
        got = bm25_score(docs, q)
        want = duck_sql(bm25_oracle_sql(q))
        assert_df_equal(got, want, sort_cols=["doc_id"])
    # non-vacuity: the rare term discriminates
    assert bm25_score(docs, ["dup"]).count() > 0


def test_bm25_planted_semantics(spark):
    """Hand-sized corpus: tf raises the score but saturates under k1;
    a RARER term outscores a commoner one at equal tf and length (the
    IDF weighting itself, not a tf side effect); docs with no query
    term are absent; token-less docs still count toward N."""
    rows = [(i, "padding words here") for i in range(10, 30)]  # bulk corpus
    rows += [
        (1, "apple apple apple apple banana"),
        (2, "apple banana zebra zebra"),
        (3, "banana banana banana"),
        (4, "zebra apple banana extra"),
        (5, "apple pad pad pad"),   # tf=1, dl=4 — matches the COMMON term
        (6, "zebra pad pad pad"),   # tf=1, dl=4 — matches the RARE term
        (7, "??? !!!"),             # zero tokens: counts in N, never scores
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s = {
        r["doc_id"]: r["score"]
        for r in bm25_score(docs, ["apple", "zebra"]).collect()
    }
    # absence: docs 3, 7 and 10..29 contain neither query term
    assert set(s) == {1, 2, 4, 5, 6}
    # tf monotone: doc1 (tf=4) beats doc4 (tf=1) on 'apple' alone…
    apple = {
        r["doc_id"]: r["score"] for r in bm25_score(docs, ["apple"]).collect()
    }
    assert apple[1] > apple[4] > 0
    # …but saturates below the idf·(k1+1) ceiling — n_docs=27 INCLUDES
    # the token-less doc 7 (the Lucene whole-collection semantics this
    # test exists to pin); df(apple)=4 (docs 1, 2, 4, 5)
    n_docs, df_apple = 27, 4
    idf = math.log((n_docs - df_apple + 0.5) / (df_apple + 0.5) + 1.0)
    assert apple[1] < idf * (BM25_K1 + 1.0)
    # rare-term dominance PROPER: docs 5 and 6 have identical tf (1) and
    # dl (4), differing ONLY in which term they match — zebra's lower df
    # (3 vs 4) must win; with a constant IDF they would tie
    assert s[6] > s[5]


def test_bm25_topk_consistent_with_scores(spark):
    docs = read_documents(spark, SF_DIR)
    q = ["scan", "dup"]
    top = bm25_topk(docs, q, k=7).toPandas()
    full = (
        bm25_score(docs, q)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(7)
        .toPandas()
    )
    assert len(top) == 7
    assert list(top["doc_id"]) == list(full["doc_id"])
    assert np.allclose(top["score"], full["score"], rtol=1e-12)
