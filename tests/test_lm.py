"""Interpolated Kneser-Ney bigram LM scoring: DuckDB value oracle
(float-tolerance venue — ln() is libm-dependent in the last ulp),
MLE degeneration at discount=0, probability-validity invariants, and
the per-context normalization identity that pins the KN algebra."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.operators.lm import (
    _doc_bigrams,
    bigram_kn_model,
    doc_bigram_kn_logprob,
    doc_bigram_kn_oracle_sql,
)


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_kn_logprob_matches_duckdb_oracle(spark):
    got = doc_bigram_kn_logprob(_docs(spark))
    want = duck_sql(doc_bigram_kn_oracle_sql())
    assert_df_equal(got, want, sort_cols=["doc_id"])
    pdf = got.toPandas()
    # non-vacuity + venue sanity: scores discriminate and are finite
    s = pdf["mean_neg_logprob"].dropna()
    assert len(s) > 0 and s.std() > 0 and np.isfinite(s).all()
    # every doc with < 2 tokens reports 0 bigrams and a null score
    assert (pdf["n_bigrams"].eq(0) == pdf["mean_neg_logprob"].isna()).all()


def test_kn_discount_zero_is_mle(spark):
    """D=0 collapses interpolated KN to the MLE bigram model
    −ln(c(w1 w2)/c(w1 ·)) — re-derived here with plain Spark aggregates,
    no shared code path with the model pipeline."""
    docs = _docs(spark)
    got = doc_bigram_kn_logprob(docs, discount=0.0).toPandas()
    bg = _doc_bigrams(docs)
    cnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    want = (
        bg.join(cnt, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(F.avg(-F.log(F.col("c12") / F.col("c1"))).alias("mle"))
        .toPandas()
    )
    m = got.merge(want, on="doc_id", how="inner")
    assert len(m) == (got["n_bigrams"] > 0).sum()
    assert np.allclose(m["mean_neg_logprob"], m["mle"], rtol=1e-9)


def test_kn_model_is_a_probability_model(spark):
    """Every observed bigram has P ∈ (0, 1], and for every context w1 the
    total mass over OBSERVED continuations plus the backoff mass routed
    to UNSEEN continuations sums to exactly 1:

        Σ_seen P(w2|w1) + λ(w1)·(1 − Σ_seen P_cont(w2)) = 1,
        λ(w1) = D·N1+(w1 ·)/c(w1 ·)

    — the normalization identity that distinguishes true interpolated KN
    from an ad-hoc discount."""
    docs = _docs(spark)
    model = bigram_kn_model(docs).toPandas()
    p = np.exp(model["logp"].to_numpy())
    assert ((p > 0) & (p <= 1 + 1e-12)).all()

    bg = _doc_bigrams(docs).toPandas()
    cnt = bg.groupby(["w1", "w2"]).size().rename("cnt").reset_index()
    c1 = cnt.groupby("w1")["cnt"].sum()
    fwd = cnt.groupby("w1").size()
    bwd = cnt.groupby("w2").size()
    nbb = len(cnt)
    d = 0.75
    m = model.set_index(["w1", "w2"])["logp"]
    for w1 in c1.index[:50]:  # 50 contexts is plenty to pin the identity
        seen = cnt[cnt["w1"] == w1]["w2"]
        mass_seen = float(np.exp(m.loc[[(w1, w2) for w2 in seen]]).sum())
        lam = d * fwd[w1] / c1[w1]
        cont_seen = float(bwd[seen].sum()) / nbb
        assert abs(mass_seen + lam * (1.0 - cont_seen) - 1.0) < 1e-9


def test_kn_external_model_scoring(spark):
    """Scoring one corpus slice against a model trained on another goes
    through the same public surface (the ``model=`` arg): train on even
    doc_ids, score odd ones; covered bigrams score identically to the
    model's own rows, and odd-only bigrams are dropped (inner join) so
    n_bigrams ≤ the self-scored count."""
    docs = _docs(spark)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    model = bigram_kn_model(train)
    got = doc_bigram_kn_logprob(score, model=model).toPandas()
    self_scored = doc_bigram_kn_logprob(score).toPandas()
    m = got.merge(self_scored, on="doc_id", suffixes=("_ext", "_self"))
    assert (m["n_bigrams_ext"] <= m["n_bigrams_self"]).all()
    assert (got["n_bigrams"] > 0).any()  # corpora share common bigrams
