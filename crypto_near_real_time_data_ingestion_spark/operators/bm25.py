"""BM25 lexical retrieval (Robertson-Spärck Jones probabilistic model,
the Okapi BM25 form) — the lexical sibling of the embedding ANN family:
rank documents against a term query without any embedding, e.g. for
retrieval-based curation (pull training docs matching a benchmark's
topic) or contamination triage.

    score(D, Q) = Σ_{t ∈ Q} IDF(t) · tf(t,D)·(k1+1)
                             / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    IDF(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)      (Lucene form,
                                                           always > 0)

Scale shape: the query-term filter is a broadcast ``isin`` applied at
the explode (docs containing no query term never shuffle); tf reduces
on (doc_id, term) with map-side partials; df for the query terms and
the corpus scalars (N, avgdl) are one aggregate each, joined back as
1-row / query-terms-sized broadcasts; the final score is one
groupBy(doc_id). Nothing is ever keyed by the full vocabulary.

Float venue: ln()-based scores are libm-last-ulp territory — pytest
tolerance oracle, never a value-hash driver entry (same rule as the
unigram/KN scorers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _doc_lengths(docs: DataFrame) -> DataFrame:
    """(doc_id, dl) for EVERY non-null-text doc — including dl=0 docs,
    which must count toward N and avgdl (Lucene counts the whole
    collection; deriving stats from the exploded term stream would
    silently drop token-less docs and inflate every IDF)."""
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(word_tokens(F.col("text"))).cast("long").alias("dl"),
    )


def _doc_terms(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, term) — one row per token occurrence, with the
    document length carried alongside (computed once, in-row)."""
    toks = word_tokens(F.col("text"))
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("term"),
        )
    )


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, n_matched, score): BM25 of every document containing at
    least one query term (non-matching docs are absent by construction —
    their score is 0). ``n_matched`` = distinct query terms present."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    t = _doc_terms(docs)
    # corpus stats from the per-doc length frame, BEFORE any term
    # filter or explode: N and avgdl describe the whole collection,
    # token-less docs included
    stats = _doc_lengths(docs).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        t.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.first("dl").alias("dl"),
        )
    )
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(contrib).alias("score"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Global top-k by (score desc, doc_id asc) — a TakeOrdered, no full
    sort (Spark plans orderBy+limit as a per-partition top-k merge)."""
    return (
        bm25_score(docs, query_terms, k1, b)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: list[str], k1: float = BM25_K1, b: float = BM25_B
) -> str:
    """Independent DuckDB formulation over the same parquet views."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    in_list = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in query_terms)
    return f"""
WITH l AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS toks
    FROM documents WHERE text IS NOT NULL
),
t AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM l),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(len(toks)) AS avgdl
    FROM l
),
tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
    FROM t WHERE term IN ({in_list})
    GROUP BY doc_id, term
),
df_t AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       CAST(count(*) AS BIGINT) AS n_matched,
       sum(ln((stats.n_docs - df_t.df + 0.5) / (df_t.df + 0.5) + 1.0)
           * (tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / stats.avgdl)))
          ) AS score
FROM tf JOIN df_t USING (term) CROSS JOIN stats
GROUP BY tf.doc_id
"""
