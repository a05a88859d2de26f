"""DSIR importance resampling (Xie et al., NeurIPS 2023) — pytest value
oracle (ln()/float-sum venue, same rule as doc_unigram_logprob /
doc_weighted_sample: floats are libm- and summation-order-sensitive, so
the check is tolerance-based here rather than value-hash-graded; every
integer column must still match exactly)."""

from __future__ import annotations

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    doc_curation_kept,
    doc_dsir_oracle_sql,
    doc_dsir_select,
)


def test_dsir_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = doc_dsir_select(docs)
    want = duck_sql(doc_dsir_oracle_sql())
    assert len(want) == 100
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_dsir_orientation_and_partition_invariance(spark):
    """The target-defining (curation-kept) docs must average a strictly
    higher importance than the rest — the whole point of the weight —
    and the result must be bit-stable under input repartitioning (the
    fit is an exact integer count table, the score an in-row fold)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.filter("text IS NOT NULL").count()
    ranked = doc_dsir_select(docs, k=n).toPandas()
    assert len(ranked) == n
    kept_ids = {
        r["doc_id"]
        for r in doc_curation_kept(docs).select("doc_id").collect()
    }
    in_t = ranked["doc_id"].isin(kept_ids)
    assert in_t.any() and (~in_t).any()
    assert (
        ranked[in_t]["log_importance"].mean()
        > ranked[~in_t]["log_importance"].mean()
    )
    again = doc_dsir_select(docs.repartition(7), k=n).toPandas()
    cols = ["doc_id", "n_grams", "log_importance", "rank"]
    a = ranked[cols].sort_values("doc_id").reset_index(drop=True)
    b = again[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_dsir_degenerate_docs(spark, tmp_path):
    """Zero-gram docs (empty/whitespace text) score exactly 0.0 and stay
    rankable; null text is excluded; single-token docs have no bigrams
    (n_grams == 1)."""
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, ""),
            (2, None),
            (3, "   "),
            (4, "solitary"),
        ],
        "doc_id bigint, text string",
    ).write.parquet(p)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_importance"])
        for r in doc_dsir_select(spark.read.parquet(p), k=10).collect()
    }
    assert set(got) == {0, 1, 3, 4}
    assert got[0][0] == 9 + 8  # 9 unigrams + 8 bigrams
    assert got[1] == (0, 0.0)
    assert got[3] == (0, 0.0)
    assert got[4][0] == 1
