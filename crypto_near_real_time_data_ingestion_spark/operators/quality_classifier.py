"""Distributed quality-classifier training: L2-regularized logistic
regression by full-batch gradient descent — the trainable step of a
DCLM/fastText-style quality filter (score every document against a
learned "looks like the reference corpus" model), trained IN the engine
instead of shipping an external model (none exists in this container).

Scale shape — the textbook distributed-GD loop, the same
bounded-driver-loop containment as the BPE/k-means/CC loops:

  * the feature frame is assembled once from in-row expressions and
    localCheckpoint'd (iterations must not re-run its lineage);
  * each iteration broadcasts the weight vector and reduces ONE
    gradient: per-Arrow-batch numpy partials (X^T (σ(Xw) − y) — a GEMV
    per batch, no per-row Python) summed by a single 1-row aggregate —
    shuffle traffic is (dim+1) doubles per task per iteration,
    independent of corpus size;
  * the driver update is O(dim); iterations are bounded (n_iter).

Float venue: partial-sum order varies with partitioning, so training is
deterministic only to float addition order — the tests pin agreement
with a single-machine numpy reference to 1e-6 (NOT bit-equality, same
venue rule as every ln()-based scorer) plus exact separation on a
planted corpus.

Features deliberately reuse the engine's quality signals
(``doc_text_stats``-style in-row expressions), standardized inside the
op with corpus moments (one extra aggregate) so the GD is
well-conditioned without hand-tuned learning rates per column.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import stopword_hits, word_tokens

N_FEATURES = 5

GRAD_SCHEMA = T.StructType(
    [
        T.StructField("g", T.ArrayType(T.DoubleType())),
        T.StructField("loss", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def doc_quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, features array<double>): the in-row quality signals a
    fastText-style filter feeds on — length, token shape, stopword and
    punctuation mass. Pure Catalyst, no shuffle. Stopword mass counts
    OCCURRENCES (``stopword_hits``, the same definition as
    ``doc_text_stats``' stopword_ratio) and punctuation mass excludes
    ALL whitespace (the ``char_classes`` n_punct definition), so the
    classifier's signals agree with the rest of the engine."""
    toks = word_tokens(F.col("text"))
    n_tok = F.size(toks)
    n_chars = F.length("text")
    n_stop = stopword_hits(F.col("text"))
    mean_wlen = F.when(
        n_tok > 0,
        F.aggregate(
            toks, F.lit(0).cast("double"), lambda a, w: a + F.length(w)
        )
        / n_tok,
    ).otherwise(F.lit(0.0))
    non_alnum = n_chars - F.length(
        F.regexp_replace("text", "[^A-Za-z0-9\\s]", "")
    )
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.array(
            F.log1p(n_chars.cast("double")),
            F.log1p(n_tok.cast("double")),
            mean_wlen,
            F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)),
            F.when(n_chars > 0, non_alnum / n_chars).otherwise(F.lit(0.0)),
        ).alias("features"),
    )


def _standardize(
    feats: DataFrame, carry: tuple[str, ...] = ()
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Z-score columns with corpus moments (one aggregate); returns the
    standardized frame (doc_id, *carry, x) and the (mean, std) vectors
    for later scoring. ``carry`` columns ride through so callers never
    need a self-join back onto the feature lineage."""
    dim = N_FEATURES
    agg = feats.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.avg(F.col("features")[i]).alias(f"m{i}") for i in range(dim)],
        *[F.stddev_pop(F.col("features")[i]).alias(f"s{i}") for i in range(dim)],
    ).collect()[0]
    if agg["n"] == 0:
        raise ValueError(
            "quality classifier: no labeled documents with non-null text"
        )
    mu = np.array([agg[f"m{i}"] for i in range(dim)])
    sd = np.array([max(agg[f"s{i}"], 1e-12) for i in range(dim)])
    std = feats.select(
        "doc_id",
        *carry,
        F.array(
            *[
                (F.col("features")[i] - float(mu[i])) / float(sd[i])
                for i in range(dim)
            ]
        ).alias("x"),
    )
    return std, mu, sd


def train_quality_classifier(
    docs: DataFrame,
    labels: DataFrame,
    n_iter: int = 100,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> dict:
    """Train on (doc_id, label∈{0,1}) rows; returns {"w": weights incl.
    bias (last), "mu": …, "sd": …, "losses": per-iteration mean loss}.
    One 1-row gradient aggregate per iteration — see module docstring.
    The L2 penalty excludes the intercept (textbook form — penalizing
    the bias shrinks every score toward 0.5 on imbalanced corpora)."""
    feats = doc_quality_features(docs).join(labels, "doc_id")
    std, mu, sd = _standardize(feats, carry=("label",))
    data = (
        std.select("x", F.col("label").cast("double").alias("y"))
        .persist()  # iterations must not replay the feature lineage
    )
    data.count()  # materialize before the loop
    dim = len(mu) + 1  # + bias
    spark = docs.sparkSession
    w = np.zeros(dim)
    # per-coordinate L2 mask: no penalty on the bias (last entry)
    l2_mask = np.ones(dim)
    l2_mask[-1] = 0.0
    losses: list[float] = []
    try:
        for _ in range(n_iter):
            bc = spark.sparkContext.broadcast(w)

            def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                wv = bc.value
                for pdf in it:
                    if len(pdf) == 0:
                        continue
                    X = np.stack(pdf["x"].to_numpy()).astype(np.float64)
                    X = np.hstack([X, np.ones((len(X), 1))])
                    y = pdf["y"].to_numpy(dtype=np.float64)
                    z = X @ wv
                    p = 1.0 / (1.0 + np.exp(-z))
                    # log-loss via the numerically stable softplus form
                    loss = float(
                        np.sum(np.logaddexp(0.0, z) - y * z)
                    )
                    yield pd.DataFrame(
                        {
                            "g": [(X.T @ (p - y)).tolist()],
                            "loss": [loss],
                            "n": [len(X)],
                        }
                    )

            row = (
                data.mapInPandas(part, schema=GRAD_SCHEMA)
                .agg(
                    F.array(
                        *[
                            F.sum(F.col("g")[i]).alias(f"g{i}")
                            for i in range(dim)
                        ]
                    ).alias("g"),
                    F.sum("loss").alias("loss"),
                    F.sum("n").alias("n"),
                )
                .collect()[0]
            )
            bc.destroy()  # the iteration's job is done; free both sides
            n = row["n"]
            grad = np.array(row["g"]) / n + l2 * l2_mask * w
            losses.append(
                row["loss"] / n
                + 0.5 * l2 * float(w[:-1] @ w[:-1])
            )
            w = w - lr * grad
    finally:
        data.unpersist()
    return {"w": w, "mu": mu, "sd": sd, "losses": losses}


def score_quality(docs: DataFrame, model: dict) -> DataFrame:
    """(doc_id, quality): σ(w·x̂) under the trained model — one map-side
    expression chain, no shuffle (the filterable score a curation
    threshold consumes)."""
    feats = doc_quality_features(docs)
    w, mu, sd = model["w"], model["mu"], model["sd"]
    z = F.lit(float(w[-1]))
    for i in range(len(mu)):
        z = z + (F.col("features")[i] - float(mu[i])) / float(sd[i]) * float(w[i])
    return feats.select(
        "doc_id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("quality")
    )
