"""Round-3 continuation ops (pytest-only, full DuckDB value oracles —
same bar as the driver, different venue; the graded registry stays at
the driver's 50-entry window):

- doc_decontaminate: training-set decontamination — per-train-doc n-gram
  overlap against the eval/benchmark holdout (broadcast semi-join), the
  GPT-3/Llama-style recipe. On this corpus the flag catches exactly the
  planted near-duplicates that leak across the md5 train/eval split.
- doc_repetition_stats: Gopher-style repetition quality signals
  (duplicate-unigram fraction, top-/duplicate-bigram fraction) computed
  map-only: array_sort + run-length fold, zero exchanges (plan-asserted).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    DECONTAM_EVAL_BYTE_MIN,
    DECONTAM_THRESHOLD,
    DOC_CORPUS_STATS_ORACLE_SQL,
    DOC_REPETITION_ORACLE_SQL,
    _md5_byte,
    doc_corpus_stats,
    doc_decontam_oracle_sql,
    doc_decontaminate,
    doc_repetition_stats,
)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = doc_decontaminate(docs)
    want = duck_sql(doc_decontam_oracle_sql())
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_decontaminate_nontrivial_and_excludes_holdout(spark):
    """The flag must actually fire (the corpus plants near-duplicates that
    leak across the hash split) without flagging everything, and the eval
    slice itself must not appear in the output."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = doc_decontaminate(docs).cache()
    n_total = out.count()
    n_flagged = out.filter("contaminated").count()
    assert 0 < n_flagged < n_total / 2, (n_flagged, n_total)
    # flagged docs sit at/above the threshold; max leak is a near-copy
    agg = out.filter("contaminated").agg(
        F.min("overlap_frac").alias("lo"), F.max("overlap_frac").alias("hi")
    ).first()
    assert agg.lo >= DECONTAM_THRESHOLD and agg.hi > 0.9, agg
    # no holdout doc leaks into the train-side report
    leaked = out.join(
        docs.filter(_md5_byte(F.col("doc_id")) >= DECONTAM_EVAL_BYTE_MIN).select(
            "doc_id"
        ),
        "doc_id",
    ).count()
    assert leaked == 0
    out.unpersist()


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval-gram dictionary side of the semi-join must be broadcast —
    at 100 TB the corpus never shuffles for the membership probe."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = doc_decontaminate(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan[:800]


# ---------------------------------------------------------------------------
# dataset card
# ---------------------------------------------------------------------------

def test_corpus_stats_match_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = doc_corpus_stats(docs)
    want = duck_sql(DOC_CORPUS_STATS_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["source", "predicted_lang", "split"])
    # the rollup is strata-sized and covers every doc exactly once
    from pyspark.sql import functions as F

    total = got.agg(F.sum("n_docs")).first()[0]
    assert total == docs.filter("text is not null").count()


# ---------------------------------------------------------------------------
# repetition stats
# ---------------------------------------------------------------------------

def test_repetition_stats_match_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = doc_repetition_stats(docs)
    want = duck_sql(DOC_REPETITION_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_repetition_stats_plan_is_map_only(spark):
    """Zero exchanges, no Python runner: a doc's grams never leave its
    row (sorted-array run-length fold, not explode+groupBy)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = doc_repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:500]
    assert "Python" not in plan, plan[:500]


REP_DOCS = [
    (0, "a b a b a b c"),   # top "a b"×3 of 6; dup 5/6; distinct 3/7
    (1, "x"),               # one token: no bigrams
    (2, ""),                # zero tokens
    (3, None),              # filtered
    (4, "w w w w"),         # degenerate repetition: all fracs max
    (5, "p q r s"),         # no repetition at all
]


@pytest.fixture(scope="module")
def rep_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rep") / "documents.parquet")
    spark.createDataFrame(REP_DOCS, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(p)
    return p


def test_repetition_stats_planted_values(spark, rep_parquet):
    rows = {
        r.doc_id: r
        for r in doc_repetition_stats(spark.read.parquet(rep_parquet)).collect()
    }
    r0 = rows[0]
    assert (r0.n_tokens, r0.n_distinct_tokens, r0.n_2grams) == (7, 3, 6)
    assert r0.top_2gram_count == 3
    assert r0.top_2gram_frac == pytest.approx(0.5)
    assert r0.dup_2gram_frac == pytest.approx(5 / 6)
    assert r0.dup_token_frac == pytest.approx(1 - 3 / 7)
    assert rows[1].n_2grams == 0 and rows[1].top_2gram_frac == 0.0
    assert rows[2].n_tokens == 0 and rows[2].dup_token_frac == 0.0
    assert 3 not in rows  # null text filtered
    r4 = rows[4]
    assert r4.top_2gram_frac == 1.0 and r4.dup_2gram_frac == 1.0
    assert r4.dup_token_frac == pytest.approx(0.75)
    r5 = rows[5]
    assert r5.top_2gram_count == 1 and r5.dup_2gram_frac == 0.0
    assert r5.dup_token_frac == 0.0


def test_repetition_stats_property_vs_python_reference(spark):
    """Randomized docs (tiny vocabulary → dense collisions) through ONE
    Spark job vs a collections.Counter reference of the definition —
    pins the run-length fold against the plain-Python semantics
    independent of the DuckDB formulation."""
    import re
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["aa", "bb", "cc", "dd", "7"])
    doc = st.lists(word, min_size=0, max_size=25).map(" ".join)

    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(st.lists(doc, min_size=1, max_size=12))
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r.doc_id: r for r in doc_repetition_stats(df).collect()}
        for i, t in rows:
            toks = re.findall("[A-Za-z0-9]+", t.lower())
            g2 = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            c = Counter(g2)
            r = got[i]
            assert r.n_tokens == len(toks) and r.n_distinct_tokens == len(set(toks))
            assert r.n_2grams == len(g2)
            assert r.top_2gram_count == (max(c.values()) if c else 0)
            dup = sum(v for v in c.values() if v >= 2)
            if g2:
                assert r.dup_2gram_frac == pytest.approx(dup / len(g2))
                assert r.top_2gram_frac == pytest.approx(max(c.values()) / len(g2))
            else:
                assert r.dup_2gram_frac == 0.0 and r.top_2gram_frac == 0.0

    run()


def test_repetition_stats_planted_fixture_matches_oracle(spark, rep_parquet):
    """Run-close edge cases (runs ending at array end, single-gram docs,
    empty docs) against the explode+groupBy DuckDB formulation."""
    got = doc_repetition_stats(spark.read.parquet(rep_parquet))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{rep_parquet}/*.parquet')"
    )
    want = con.execute(DOC_REPETITION_ORACLE_SQL).df()
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_unigram_logprob_matches_oracle(spark):
    """CCNet-style perplexity proxy: float-tolerance comparison (ln() is
    libm-dependent in the last ulp — deliberately a pytest check, not a
    value-hash driver entry); integer columns must match exactly."""
    from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
        DOC_UNIGRAM_LOGPROB_ORACLE_SQL,
        doc_unigram_logprob,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = doc_unigram_logprob(docs)
    want = duck_sql(DOC_UNIGRAM_LOGPROB_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["doc_id"])
    # orientation sanity: rare-token docs must score HIGHER than a doc
    # made of the corpus's most common tokens
    pdf = got.toPandas()
    assert pdf["mean_neg_logprob"].std() > 0


# ---------------------------------------------------------------------------
# duplicate-span REMOVAL (the ExactSubstr cut itself)
# ---------------------------------------------------------------------------


def test_dedup_spans_matches_oracle(spark):
    from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
        DOC_DEDUP_SPANS_ORACLE_SQL,
        doc_dedup_spans,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = doc_dedup_spans(docs)
    want = duck_sql(DOC_DEDUP_SPANS_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_dedup_spans_planted(spark):
    """Hand-computed cuts on the stats op's planted fixture: the shared
    trigram 'the quick brown' is removed from BOTH documents, everything
    else survives verbatim (lowercased, whitespace-canonical)."""
    from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
        doc_dedup_spans,
    )

    rows = [
        ("d1", "s", "The quick brown fox jumps"),
        ("d2", "s", "see the quick brown dog"),
        ("d3", "s", "entirely different words here"),
        ("d4", "s", "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["text_clean"])
        for r in doc_dedup_spans(df).collect()
    }
    assert got == {
        "d1": (5, 2, "fox jumps"),
        "d2": (5, 2, "see dog"),
        "d3": (4, 4, "entirely different words here"),
        "d4": (2, 2, "too short"),
    }


def test_dedup_spans_consistent_with_stats(spark):
    """The cut and the signal must agree: tokens removed per doc ==
    n_dup_positions reported by doc_dup_span_stats, on every document of
    the driver corpus."""
    from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
        doc_dedup_spans,
        doc_dup_span_stats,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cut = doc_dedup_spans(docs).select(
        "doc_id", (F.col("n_tokens") - F.col("n_kept")).alias("removed")
    )
    sig = doc_dup_span_stats(docs).select("doc_id", "n_dup_positions")
    diff = cut.join(sig, "doc_id").filter(
        F.col("removed") != F.col("n_dup_positions")
    )
    assert diff.count() == 0


# ---------------------------------------------------------------------------
# corpus-wide line dedup (CCNet/RefinedWeb paragraph rule)
# ---------------------------------------------------------------------------

LINE_DOCS = [
    (0, "alpha\nbeta\ngamma"),   # all first occurrences
    (1, "beta\nxray\n\ngamma"),  # beta+gamma removed; blank line exempt
    (2, "beta\nbeta"),           # both removed (first beta lives in doc 0)
    (3, "unique only"),          # untouched single line
    (4, None),                   # filtered
    (5, "  \nzulu\n"),           # whitespace-only + trailing '' exempt
    (6, "zulu"),                 # removed ((5,1) precedes (6,0))
]


@pytest.fixture(scope="module")
def line_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("lines") / "documents.parquet")
    spark.createDataFrame(LINE_DOCS, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(p)
    return p


def test_line_dedup_matches_oracle(spark):
    from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
        DOC_LINE_DEDUP_ORACLE_SQL,
        doc_line_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = doc_line_dedup(docs)
    want = duck_sql(DOC_LINE_DEDUP_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["doc_id"])
    # the driver corpus has 500 distinct single-line texts — the op must
    # be an exact no-op there (the PII-scrub precedent: fixture proves
    # the pass-through, the planted fixtures prove the firing paths)
    assert got.filter("n_kept < n_lines").count() == 0


def test_line_dedup_planted_values(spark, line_parquet):
    from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
        doc_line_dedup,
    )

    rows = {
        r["doc_id"]: (
            r["n_lines"], r["n_kept"], r["dup_line_frac"], r["drop_doc"],
            r["text_clean"],
        )
        for r in doc_line_dedup(spark.read.parquet(line_parquet)).collect()
    }
    assert rows == {
        0: (3, 3, 0.0, False, "alpha\nbeta\ngamma"),
        1: (4, 2, 0.5, True, "xray\n"),
        2: (2, 0, 1.0, True, ""),
        3: (1, 1, 0.0, False, "unique only"),
        5: (3, 3, 0.0, False, "  \nzulu\n"),
        6: (1, 0, 1.0, True, ""),
    }


def test_line_dedup_planted_fixture_matches_oracle(spark, line_parquet):
    """Blank-exemption, within-doc dups, trailing-newline empties and the
    (doc_id, pos) first-occurrence order against the window-function
    DuckDB formulation."""
    from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
        DOC_LINE_DEDUP_ORACLE_SQL,
        doc_line_dedup,
    )

    got = doc_line_dedup(spark.read.parquet(line_parquet))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{line_parquet}/*.parquet')"
    )
    want = con.execute(DOC_LINE_DEDUP_ORACLE_SQL).df()
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_line_dedup_consistent_with_exact_dedup(spark):
    """On a corpus with no newlines, whole-document duplicates degenerate
    to single-line duplicates: every non-canonical exact copy with
    non-blank text must lose its only line, and every canonical doc must
    keep everything. The driver fixture has no exact copies, so plant
    them: re-append 50 docs under higher ids."""
    from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
        doc_exact_dedup,
        doc_line_dedup,
    )

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    copies = base.orderBy("doc_id").limit(50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    docs = base.unionByName(copies)
    joined = (
        docs.filter(F.col("text").isNotNull())
        .filter(F.trim("text") != "")
        .select("doc_id", F.md5("text").alias("text_md5"))
        .join(doc_exact_dedup(docs), "text_md5")
        .join(doc_line_dedup(docs), "doc_id")
    )
    bad_copy = joined.filter(
        (F.col("doc_id") != F.col("canonical_doc_id")) & (F.col("n_kept") != 0)
    )
    bad_canon = joined.filter(
        (F.col("doc_id") == F.col("canonical_doc_id"))
        & (F.col("n_kept") != F.col("n_lines"))
    )
    assert bad_copy.count() == 0
    assert bad_canon.count() == 0
