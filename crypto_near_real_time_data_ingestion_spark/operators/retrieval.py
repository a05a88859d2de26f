"""Hybrid retrieval — reciprocal-rank fusion (RRF) of a lexical ranking
and an embedding-cosine ranking, the standard two-tower fusion every
retrieval-based curation pipeline runs (pull training docs matching a
benchmark topic by BOTH surface terms and semantics; Cormack et al.'s
RRF is the fusion used by Elasticsearch/Vespa/Pinecone hybrid search):

    rrf(d) = Σ_ranker 1 / (K + rank_ranker(d))        (K = 60 classically)

Scale shape (the 100 TB question):

* Candidate generation is per-ranker **distributed TakeOrdered**
  (``orderBy + limit`` — Spark plans a per-partition top-``pool`` merge,
  never a full sort).  The lexical scorer is one (doc_id)-keyed
  aggregate over a broadcast-``isin``-filtered explode (docs containing
  no query term never shuffle); the semantic scorer is **map-only** —
  one query vector crossed in as a broadcast 1-row frame, the dot
  product an in-row Catalyst fold, no shuffle before the TakeOrdered.
* Fusion touches only the two ≤ ``pool``-row candidate frames: rank
  assignment is a window over a constant-bounded frame (cost O(pool),
  independent of corpus size), then one full-outer join and a final
  TakeOrdered(k).  Nothing downstream of candidate generation scales
  with the corpus.

Value-hash safety (driver-graded): the lexical ranking orders by an
INTEGER score (total query-term occurrences) and the semantic ranking
by the family's round6 cosine — both orderings are cross-engine exact,
with doc_id tiebreaks, so ranks are integers both engines agree on.
The RRF score is a two-term sum of 1/(K+rank) doubles computed in the
same order from the same integers → bit-identical; round6 on both
sides as belt-and-braces.  Absent-from-pool ranks are coalesced to 0
(not NULL: Spark's None and DuckDB's NaN stringify differently under
the driver's hash).

BM25-scored fusion is also supported (``lex_scorer="bm25"``) but is
libm territory — pytest tolerance oracle only, same rule as
``operators/bm25.py``.

Reference parity: generalizes the reference's filtered-aggregate +
join + rank stage (gold_features_base_job.py windowed ranks over
aggregated scores) to the two-ranker retrieval setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import word_tokens
from .bm25 import bm25_score

RRF_K = 60


def lexical_tf_score(docs: DataFrame, query_terms: list[str]) -> DataFrame:
    """(doc_id, tf_total): total occurrences of the query terms per doc
    (integer — the hash-safe lexical evidence).  Broadcast ``isin`` at
    the explode, one map-side-combined aggregate; non-matching docs are
    absent by construction."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(word_tokens(F.col("text"))).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf_total"))
    )


def semantic_query_scores(emb: DataFrame, query_vec_id: int) -> DataFrame:
    """(vec_id, cosine): round6 cosine of every vector (except the query
    itself) against the corpus vector ``query_vec_id`` — map-only: the
    query row is crossed in as a broadcast 1-row frame and the dot
    product is an in-row Catalyst fold (same expression family as
    ``plans/documents_gold._with_cosine``; round6 absorbs the
    accumulation-order difference vs DuckDB's list_cosine_similarity)."""
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn(
        "ssq", F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    q = (
        e.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("v").alias("qv"), F.col("ssq").alias("qssq"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot / F.sqrt(F.col("ssq") * F.col("qssq")), 6).alias("cosine"),
        )
    )


def _pool_ranks(
    scored: DataFrame, score_col: str, id_col: str, pool: int, rank_name: str
) -> DataFrame:
    """Top-``pool`` candidates with their 1-based rank by
    (score desc, id asc).  The orderBy+limit is the distributed
    TakeOrdered; the row_number window then runs over ≤ pool rows
    (constant-bounded — NOT a corpus-wide window)."""
    top = scored.orderBy(F.desc(score_col), F.asc(id_col)).limit(pool)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return top.select(
        F.col(id_col).alias("doc_id"),
        F.row_number().over(w).cast("long").alias(rank_name),
    )


def rrf_fuse(
    lex_ranks: DataFrame,
    sem_ranks: DataFrame,
    k: int = 20,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Fuse two (doc_id, rank_*) candidate frames: full-outer join,
    1/(K+rank) per present ranker, top-k by (rrf desc, doc_id asc).
    Absent ranks surface as 0 (hash-stable across engines)."""
    lex_term = F.when(
        F.col("rank_lex").isNotNull(), F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_lex"))
    ).otherwise(F.lit(0.0))
    sem_term = F.when(
        F.col("rank_sem").isNotNull(), F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_sem"))
    ).otherwise(F.lit(0.0))
    return (
        lex_ranks.join(sem_ranks, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rank_lex", F.lit(0)).cast("long").alias("rank_lex"),
            F.coalesce("rank_sem", F.lit(0)).cast("long").alias("rank_sem"),
            F.round(lex_term + sem_term, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 20,
    pool: int = 100,
    rrf_k: int = RRF_K,
    lex_scorer: str = "tf",
) -> DataFrame:
    """The graded composition: (doc_id, rank_lex, rank_sem, rrf_score)
    — top-``k`` fused results from a ``pool``-deep candidate set per
    ranker.  ``lex_scorer="bm25"`` swaps in the Okapi scorer (float —
    pytest tolerance oracle only)."""
    if lex_scorer == "tf":
        lex = lexical_tf_score(docs, query_terms)
        lex_ranks = _pool_ranks(lex, "tf_total", "doc_id", pool, "rank_lex")
    elif lex_scorer == "bm25":
        lex = bm25_score(docs, query_terms)
        lex_ranks = _pool_ranks(lex, "score", "doc_id", pool, "rank_lex")
    else:
        raise ValueError(f"unknown lex_scorer: {lex_scorer!r}")
    sem = semantic_query_scores(emb, query_vec_id)
    sem_ranks = _pool_ranks(sem, "cosine", "vec_id", pool, "rank_sem")
    return rrf_fuse(lex_ranks, sem_ranks, k=k, rrf_k=rrf_k)


def hybrid_rrf_oracle_sql(
    query_terms: list[str],
    query_vec_id: int,
    k: int = 20,
    pool: int = 100,
    rrf_k: int = RRF_K,
) -> str:
    """Independent DuckDB formulation of the tf-scored fusion over the
    same parquet views (documents + embeddings)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    in_list = ", ".join(
        "'" + t.lower().replace("'", "''") + "'" for t in query_terms
    )
    return f"""
WITH lex AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS tf_total
    FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS term
          FROM documents WHERE text IS NOT NULL)
    WHERE term IN ({in_list})
    GROUP BY doc_id
),
lex_pool AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY tf_total DESC, doc_id ASC) AS rank_lex
    FROM lex
    QUALIFY rank_lex <= {pool}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
sem AS (
    SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cosine
    FROM e, q WHERE vec_id <> {query_vec_id}
),
sem_pool AS (
    SELECT vec_id AS doc_id,
           row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank_sem
    FROM sem
    QUALIFY rank_sem <= {pool}
),
fused AS (
    SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
           CAST(coalesce(l.rank_lex, 0) AS BIGINT) AS rank_lex,
           CAST(coalesce(s.rank_sem, 0) AS BIGINT) AS rank_sem,
           round(coalesce(1.0 / ({rrf_k} + l.rank_lex), 0.0)
                 + coalesce(1.0 / ({rrf_k} + s.rank_sem), 0.0), 6) AS rrf_score
    FROM lex_pool l FULL OUTER JOIN sem_pool s ON l.doc_id = s.doc_id
)
SELECT doc_id, rank_lex, rank_sem, rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {k}
"""
