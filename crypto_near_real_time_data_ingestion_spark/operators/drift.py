"""Corpus drift detection — distribution-shift measurement between two
corpus snapshots (release n vs n−1, a source before/after a filter
change, train vs incoming stream), the release-QA step that tells you
whether a pipeline change altered WHAT the corpus says rather than
just how many rows it has (which ``operators/fingerprint.py`` already
answers bit-exactly).

Two standard f-divergences over the word-unigram distributions, both
from ONE vocabulary-keyed join:

  * Jensen-Shannon divergence (nats, symmetric, bounded by ln 2):
      JS(P,Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),  m = (p+q)/2
    with the 0·ln(0/m) = 0 convention — defined even on disjoint
    vocabularies (where it attains ln 2), unlike KL.
  * Total variation: TV(P,Q) = ½·Σ |p − q| ∈ [0, 1].

Scale shape: two map-side-combined token aggregates (shuffle ∝ DISTINCT
vocabulary per side, never corpus tokens), one full-outer equi-join on
the token key (vocabulary-sized — the ``doc_unigram_logprob`` regime;
a 100 TB corpus's word vocabulary is still ≪ its token stream), and a
1-row final aggregate. Nothing is collected; the output is one row.
When even the vocabulary join is too much, the bounded-memory fallback
is comparing the two corpora's Count-Min sketches
(``operators/countmin.py``) — same pointwise shape, cell-keyed.

Tokenization is the family-wide ``word_tokens`` single definition, so
drift is measured over exactly the distribution every other text op
(heavy hitters, DSIR, unigram scoring) sees.

Float venue: ln()-based — pytest tolerance oracle vs DuckDB, never a
value-hash driver entry (the ``doc_unigram_logprob``/BM25 rule).

Reference semantics anchored: the reference's QA layer compares
per-window aggregate profiles across runs (gold_features_base_job.py's
grouped metric rollups); this is the same before/after comparison
generalized to full distributions over an unbounded key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _divergence_terms(p, q):
    """Per-key JS and TV summands over two probability columns — THE
    formula (single definition: the exact vocabulary path and the
    sketch-bucket path must never drift apart). 0·ln(0/m) ≡ 0; m > 0 on
    every row both paths feed it (a key absent from BOTH sides never
    survives their full-outer joins)."""
    m = (p + q) / F.lit(2.0)
    js = (
        F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / F.lit(2.0)
    tv = F.abs(p - q) / F.lit(2.0)
    return js, tv


def _token_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """THE corpus token-count frame — delegated to
    ``heavy_hitters.token_counts_exact`` (same explode + groupBy over
    ``word_tokens``) so the two corpus-wide token-count shapes cannot
    drift apart (single-definition rule)."""
    from .heavy_hitters import token_counts_exact

    return token_counts_exact(docs, text_col).withColumnRenamed("count", "cnt")


def corpus_drift(
    docs_a: DataFrame, docs_b: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One row — (js_divergence, total_variation, n_tokens_a,
    n_tokens_b, vocab_a, vocab_b, vocab_shared): how far corpus B's
    word distribution moved from corpus A's. js_divergence is in nats
    (0 = identical distributions, ln 2 ≈ 0.6931 = disjoint
    vocabularies); total_variation ∈ [0, 1] is the largest possible
    difference in probability either corpus assigns to any token set.

    An EMPTY side has no distribution: both divergences come back NULL
    (not 0 — "no drift" and "nothing to compare" must not alias); the
    result is ALWAYS exactly one row, also when both sides are empty
    (same shape contract as ``sketch_drift``)."""
    fa = _token_freqs(docs_a, text_col).withColumnRenamed("cnt", "ca")
    fb = _token_freqs(docs_b, text_col).withColumnRenamed("cnt", "cb")
    joined = fa.join(fb, "token", "full_outer").select(
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
    )
    totals = joined.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum((F.col("ca") > 0).cast("long")).alias("vocab_a"),
        F.sum((F.col("cb") > 0).cast("long")).alias("vocab_b"),
        F.sum(((F.col("ca") > 0) & (F.col("cb") > 0)).cast("long")).alias(
            "vocab_shared"
        ),
    )
    # broadcast the 1-row totals: p = ca/na, q = cb/nb computed in-row,
    # then one final aggregate — no second pass over either corpus
    with_p = joined.crossJoin(F.broadcast(totals))
    # guarded division: an empty side has na/nb = 0 and ANSI Spark would
    # throw; the one-sided "distribution" folds to all-zero and the
    # empty_guard below nulls the divergences anyway
    p = F.when(F.col("na") > 0, F.col("ca") / F.col("na")).otherwise(F.lit(0.0))
    q = F.when(F.col("nb") > 0, F.col("cb") / F.col("nb")).otherwise(F.lit(0.0))
    js_term, tv_term = _divergence_terms(p, q)
    # two 1-row frames cross-joined ⇒ the result is ALWAYS one row,
    # including the both-empty case (a groupBy on the empty joined frame
    # would emit zero rows and break the one-shape-family contract)
    sums = with_p.agg(F.sum(js_term).alias("js"), F.sum(tv_term).alias("tv"))
    out = sums.crossJoin(totals)
    empty_guard = (F.col("na") > 0) & (F.col("nb") > 0)  # NULL-safe: a
    # NULL total (empty join) makes the guard non-true ⇒ NULL divergence
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).alias(c)  # noqa: E731
    return out.select(
        F.when(empty_guard, F.col("js")).alias("js_divergence"),
        F.when(empty_guard, F.col("tv")).alias("total_variation"),
        F.coalesce(F.col("na"), F.lit(0)).alias("n_tokens_a"),
        F.coalesce(F.col("nb"), F.lit(0)).alias("n_tokens_b"),
        zero("vocab_a"),
        zero("vocab_b"),
        zero("vocab_shared"),
    )


DRIFT_ORACLE_SQL_TEMPLATE = """
WITH ta AS (
    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
    FROM ({a}) WHERE text IS NOT NULL
),
tb AS (
    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
    FROM ({b}) WHERE text IS NOT NULL
),
fa AS (SELECT token, count(*) AS ca FROM ta GROUP BY 1),
fb AS (SELECT token, count(*) AS cb FROM tb GROUP BY 1),
j AS (
    SELECT coalesce(fa.ca, 0) AS ca, coalesce(fb.cb, 0) AS cb
    FROM fa FULL OUTER JOIN fb ON fa.token = fb.token
),
t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM j)
SELECT
  sum(CASE WHEN ca > 0 THEN (ca / t.na) * ln((ca / t.na) /
        ((ca / t.na + cb / t.nb) / 2)) ELSE 0 END
    + CASE WHEN cb > 0 THEN (cb / t.nb) * ln((cb / t.nb) /
        ((ca / t.na + cb / t.nb) / 2)) ELSE 0 END) / 2 AS js_divergence,
  sum(abs(ca / t.na - cb / t.nb)) / 2 AS total_variation
FROM j, t
GROUP BY t.na, t.nb
"""


def sketch_drift(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Certified drift FLOOR from two same-parameter Count-Min sketches
    (``operators/countmin.py``) — the bounded-memory path when even the
    vocabulary join is too much (10^13 distinct n-grams): each depth
    row's width buckets carry the pushforward of the true distribution
    through that row's hash, and every f-divergence can only SHRINK
    under such a many-to-one mapping (the data-processing inequality).
    So per-row JS/TV lower-bound the true values, and the max over the
    depth rows is the tightest certified floor — "the corpora differ by
    AT LEAST this much", from depth×width cells however large either
    corpus is. (No upper bound exists from a sketch: collisions can
    hide drift, never invent it.)

    Output: one row (js_floor, tv_floor) — NULLs when either sketch is
    empty (nothing to compare ≠ no drift; a global aggregate always
    returns its one row, so two empty sketches also yield the NULL row).

    Shape: one full-outer join of two ≤ depth·width-cell frames and two
    tiny aggregates — nothing touches the corpora.

    BOTH sketches must be built under the SAME (width, depth, seed) or
    the joined cells compare different pushforward maps and the floor
    certifies drift that does not exist: the structural half is
    validated here against the passed width/depth (both sides), the
    seed half is invisible — bind it via ``CountMinSink``'s persisted
    params or your own config."""
    from .countmin import check_sketch_params

    check_sketch_params(sketch_a, width, depth)
    check_sketch_params(sketch_b, width, depth)
    a = sketch_a.select("row", "col", F.col("count").alias("ca"))
    b = sketch_b.select("row", "col", F.col("count").alias("cb"))
    joined = a.join(b, ["row", "col"], "full_outer").select(
        "row",
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
    )
    totals = joined.groupBy("row").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    with_p = joined.join(F.broadcast(totals), "row")
    p = F.when(F.col("na") > 0, F.col("ca") / F.col("na")).otherwise(F.lit(0.0))
    q = F.when(F.col("nb") > 0, F.col("cb") / F.col("nb")).otherwise(F.lit(0.0))
    js_term, tv_term = _divergence_terms(p, q)
    guard = (F.col("na") > 0) & (F.col("nb") > 0)
    per_row = with_p.groupBy("row", "na", "nb").agg(
        F.sum(F.when(guard, js_term)).alias("js"),
        F.sum(F.when(guard, tv_term)).alias("tv"),
    )
    return per_row.agg(
        F.max("js").alias("js_floor"), F.max("tv").alias("tv_floor")
    )


def corpus_drift_by(
    docs_a: DataFrame,
    docs_b: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group drift — "WHICH source moved?": one row per group value
    with the same (js_divergence, total_variation, n_tokens_a,
    n_tokens_b) semantics as ``corpus_drift``, distributions normalized
    WITHIN each group. A group present on only one side reports NULL
    divergences with its token counts (nothing to compare against —
    the caller decides whether appearance/disappearance is drift).

    Scale shape: the joins key on (group, token) — shuffle ∝ per-group
    vocabularies; per-group totals are a groups-sized frame joined back
    (not broadcast-forced: group cardinality is the caller's domain)."""
    from ..functions.text import word_tokens

    def freqs(docs, name):
        return (
            docs.filter(F.col(text_col).isNotNull())
            .select(
                F.col(group_col).alias("grp"),
                F.explode(word_tokens(F.col(text_col))).alias("token"),
            )
            .groupBy("grp", "token")
            .agg(F.count(F.lit(1)).alias(name))
        )

    joined = (
        freqs(docs_a, "ca")
        .join(freqs(docs_b, "cb"), ["grp", "token"], "full_outer")
        .select(
            "grp",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    totals = joined.groupBy("grp").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    with_p = joined.join(totals, "grp")
    p = F.when(F.col("na") > 0, F.col("ca") / F.col("na")).otherwise(F.lit(0.0))
    q = F.when(F.col("nb") > 0, F.col("cb") / F.col("nb")).otherwise(F.lit(0.0))
    js_term, tv_term = _divergence_terms(p, q)
    guard = (F.col("na") > 0) & (F.col("nb") > 0)
    return with_p.groupBy("grp", "na", "nb").agg(
        F.sum(F.when(guard, js_term)).alias("js_divergence"),
        F.sum(F.when(guard, tv_term)).alias("total_variation"),
    ).select(
        F.col("grp").alias(group_col),
        "js_divergence",
        "total_variation",
        F.col("na").alias("n_tokens_a"),
        F.col("nb").alias("n_tokens_b"),
    )
