"""Distributed logistic-regression quality filter: agreement with a
single-machine numpy reference (float-venue tolerance), monotone
training loss, perfect separation + score ordering on a planted
corpus, and feature determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_DIR

from crypto_near_real_time_data_ingestion_spark.operators.quality_classifier import (
    doc_quality_features,
    score_quality,
    train_quality_classifier,
)
from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    _md5_byte,
    read_documents,
)

N_ITER = 60


def _numpy_reference(X, y, n_iter=N_ITER, lr=0.5, l2=1e-3):
    mu, sd = X.mean(axis=0), np.maximum(X.std(axis=0), 1e-12)
    Xs = np.hstack([(X - mu) / sd, np.ones((len(X), 1))])
    w = np.zeros(Xs.shape[1])
    # L2 excludes the intercept (last weight), matching the op
    mask = np.ones(Xs.shape[1])
    mask[-1] = 0.0
    losses = []
    for _ in range(n_iter):
        z = Xs @ w
        p = 1.0 / (1.0 + np.exp(-z))
        losses.append(
            float(np.mean(np.logaddexp(0.0, z) - y * z))
            + 0.5 * l2 * float(w[:-1] @ w[:-1])
        )
        w = w - lr * (Xs.T @ (p - y) / len(Xs) + l2 * mask * w)
    return w, losses


def _labeled(spark):
    """Deterministic pseudo-labels over the fixture corpus (hash byte) —
    arbitrary but fixed, which is all the reference comparison needs."""
    docs = read_documents(spark, SF_DIR)
    labels = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", (_md5_byte(F.col("doc_id")) % 2).alias("label")
    )
    return docs, labels


def test_training_matches_numpy_reference(spark):
    docs, labels = _labeled(spark)
    model = train_quality_classifier(docs, labels, n_iter=N_ITER)
    pdf = (
        doc_quality_features(docs)
        .join(labels, "doc_id")
        .orderBy("doc_id")
        .toPandas()
    )
    X = np.stack(pdf["features"].to_numpy()).astype(np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)
    w_ref, losses_ref = _numpy_reference(X, y)
    # float venue: partial-sum order differs across partitions — 1e-6,
    # never bit-equality
    assert np.allclose(model["w"], w_ref, atol=1e-6)
    assert np.allclose(model["losses"], losses_ref, atol=1e-6)


def test_planted_corpus_separates_and_scores_order(spark):
    """Long clean prose vs short symbol soup: training must reach 100%
    accuracy and every clean doc must outscore every junk doc."""
    clean = [
        (i, "s", "the quick brown fox jumps over the lazy dog and keeps "
                 "running through the quiet field for a long while " * 3)
        for i in range(20)
    ]
    junk = [
        (100 + i, "s", "@#$% ^^ !! ~~ " + "#" * (i % 5)) for i in range(20)
    ]
    docs = spark.createDataFrame(
        [(d, s, t) for d, s, t in clean + junk],
        "doc_id long, source string, text string",
    )
    labels = docs.select(
        "doc_id", F.when(F.col("doc_id") < 100, 1).otherwise(0).alias("label")
    )
    model = train_quality_classifier(docs, labels, n_iter=80)
    assert model["losses"][-1] < model["losses"][0]
    assert model["losses"][-1] < 0.2
    scores = {
        r["doc_id"]: r["quality"]
        for r in score_quality(docs, model).collect()
    }
    assert min(scores[d] for d, _, _ in clean) > max(
        scores[d] for d, _, _ in junk
    )


def test_empty_labeled_set_fails_loudly(spark):
    """No labeled docs (or all labeled text NULL) must raise a clear
    error, not an opaque NoneType crash — the same loud-degradation
    contract as the assembly capstone."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "s", "some text"), (2, "s", None)],
        "doc_id long, source string, text string",
    )
    no_overlap = spark.createDataFrame([(99, 1)], "doc_id long, label int")
    with pytest.raises(ValueError, match="no labeled documents"):
        train_quality_classifier(docs, no_overlap, n_iter=1)
    null_text = spark.createDataFrame([(2, 1)], "doc_id long, label int")
    with pytest.raises(ValueError, match="no labeled documents"):
        train_quality_classifier(docs, null_text, n_iter=1)


def test_scoring_is_map_only(spark):
    """The deployed filter is one expression chain: no Exchange in the
    scoring plan."""
    docs, labels = _labeled(spark)
    model = train_quality_classifier(docs, labels, n_iter=3)
    plan = (
        score_quality(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
