"""Interpolated Kneser-Ney bigram LM quality scoring — the model-based
step up from the unigram perplexity proxy (``plans.documents_gold
.doc_unigram_logprob``), i.e. the CCNet/KenLM-style filter with the LM
itself trained distributed (no external model ships in this container).

Interpolated KN with a single absolute discount D (Chen & Goodman 1998,
eq. 4.26, bigram order):

    P(w2|w1) = (max(c(w1 w2) − D, 0) + D·N1+(w1 ·)·P_cont(w2)) / c(w1 ·)
    P_cont(w2) = N1+(· w2) / N1+(· ·)

where N1+ are distinct-continuation counts — the KN insight that a
word's backoff weight is how many CONTEXTS it follows, not how often
(e.g. "francisco" is frequent but predictable-only-after-"san").

Scale shape: every stage is a keyed aggregate or a co-keyed join —
  * bigram expansion is a map-only in-row ``transform`` over the token
    array (no posexplode self-join);
  * the count/context/continuation tables reduce with map-side partials
    (shuffle ∝ DISTINCT bigrams, not corpus tokens);
  * scoring joins doc bigrams to the model ON THE BIGRAM KEY — a plain
    shuffle join, deliberately NOT a broadcast: a 100 TB corpus's bigram
    table is itself huge (the unigram scorer broadcasts because its
    table is vocabulary-sized; this one must not);
  * the per-doc score is one groupBy(doc_id) mean.

Self-scoring (model trained on the scored corpus) needs no OOV handling:
every scored bigram has c ≥ 1, so P > 0 (the discounted term keeps
c − D > 0 for D < 1). Scoring an EXTERNAL corpus against a trained
``bigram_kn_model`` drops unseen bigrams at the inner join — cap the
model to top-K bigrams + an explicit unk floor for that regime (same
venue rule as the unigram scorer's top-K note).

Reference parity: the reference has no text-quality surface; this is
part of the training-data pipeline the north star adds. Float outputs
are ln()-based (libm last-ulp venue: pytest tolerance, never a
value-hash driver entry — integer columns still match exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_tokens

KN_DISCOUNT = 0.75


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, built with an
    in-row indexed ``transform`` (map-only; docs with < 2 tokens emit
    nothing and are re-attached as n_bigrams=0 by the scorer)."""
    toks = word_tokens(F.col("text"))
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )


def bigram_kn_model(docs: DataFrame, discount: float = KN_DISCOUNT) -> DataFrame:
    """(w1, w2, logp): interpolated-KN log-probability for every bigram
    observed in ``docs``. One shuffle keyed by (w1, w2) builds the
    counts; the context (c(w1 ·), N1+(w1 ·)) and continuation
    (N1+(· w2)) tables derive from it with vocabulary-sized aggregates
    and join back co-keyed; N1+(· ·) is a 1-row broadcast."""
    return _kn_model_from_bigrams(_doc_bigrams(docs), discount)


def _kn_model_from_bigrams(bg: DataFrame, discount: float) -> DataFrame:
    cnt = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ctx = cnt.groupBy("w1").agg(
        F.sum("cnt").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("fwd"),
    )
    bwd = cnt.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("bwd"))
    nbb = cnt.agg(F.count(F.lit(1)).cast("long").alias("nbb"))
    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("cnt") - d, F.lit(0.0))
        + d * F.col("fwd") * (F.col("bwd") / F.col("nbb"))
    ) / F.col("c1")
    return (
        cnt.join(ctx, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(nbb))
        .select("w1", "w2", F.log(p).alias("logp"))
    )


def doc_bigram_kn_logprob(
    docs: DataFrame,
    discount: float = KN_DISCOUNT,
    model: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, mean_neg_logprob): per-document mean negative
    interpolated-KN bigram log-probability — low = predictable
    boilerplate, high = surprising/rare sequences. Self-scored by
    default; pass a trained ``model`` to score against a reference
    corpus (see module note on OOV)."""
    bg = _doc_bigrams(docs)
    if model is None:
        # self-scoring consumes the bigram expansion twice (model counts
        # + the scoring join); a lazy localCheckpoint materializes the
        # corpus-wide tokenize/explode once and is ContextCleaner-
        # released with the result (never cache() — see ann.py note)
        bg = bg.localCheckpoint(eager=False)
        model = _kn_model_from_bigrams(bg, discount)
    scored = bg.join(model, ["w1", "w2"]).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.avg(-F.col("logp")).alias("mean_neg_logprob"),
    )
    base = docs.filter(F.col("text").isNotNull()).select("doc_id")
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        "mean_neg_logprob",
    )


def doc_bigram_kn_oracle_sql(discount: float = KN_DISCOUNT) -> str:
    """Independent DuckDB formulation (positional array indexing instead
    of the indexed transform; USING joins instead of the model pipeline)."""
    return f"""
WITH l AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS toks
    FROM documents WHERE text IS NOT NULL
),
bg AS (
    SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
    FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM l
    )
),
cnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS fwd
        FROM cnt GROUP BY w1),
bwd AS (SELECT w2, CAST(count(*) AS BIGINT) AS bwd FROM cnt GROUP BY w2),
nbb AS (SELECT CAST(count(*) AS BIGINT) AS nbb FROM cnt),
model AS (
    SELECT cnt.w1, cnt.w2,
           ln((greatest(cnt.cnt - {discount}, 0)
               + {discount} * ctx.fwd * (CAST(bwd.bwd AS DOUBLE) / nbb.nbb))
              / ctx.c1) AS logp
    FROM cnt JOIN ctx USING (w1) JOIN bwd USING (w2) CROSS JOIN nbb
),
s AS (
    SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           avg(-model.logp) AS mean_neg_logprob
    FROM bg JOIN model USING (w1, w2)
    GROUP BY bg.doc_id
)
SELECT l.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       s.mean_neg_logprob
FROM l LEFT JOIN s USING (doc_id)
"""
