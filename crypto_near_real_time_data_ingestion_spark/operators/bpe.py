"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The one tokenizer-side operator a training-data pipeline actually RUNS
at corpus scale: learn a byte-pair-encoding merge table from the corpus
itself, then segment text with it. The repo's ``token_count_bpe_ish``
counts pre-tokens; this module learns the subword vocabulary beneath
them.

Scale shape (the part that matters at 100 TB):

  * The corpus is touched ONCE — ``word_freqs`` pre-tokenizes with the
    same ``BPE_ISH_RE`` used by the quality stats and reduces to a
    (word, freq) table with one map-side-combined shuffle. Everything
    after runs over the DISTINCT-word table, whose size tracks the
    vocabulary (∝ 10^7-10^8 rows), not the corpus (∝ 10^12 tokens).
  * Each merge iteration is ONE partial-agg shuffle: adjacent symbol
    pairs are exploded JVM-side (``arrays_zip`` of two ``slice``s — no
    Python) and summed weighted by word frequency; the argmax crossing
    the driver is a single row (``orderBy.limit(1)``), and the driver
    accumulates only the merge list itself (n_merges × a few bytes).
  * Applying a merge rewrites the symbols column with a BATCH-vectorized
    ``mapInPandas`` (one flat numpy pass over the Arrow batch's
    concatenated symbol arrays — the winnow/LSH hashing style, no
    per-row Python loop). Greedy left-to-right overlap resolution is
    the run-parity rule: for a != b consecutive matches are impossible
    (s[p+1] would have to equal both a and b); for a == b ("aa" in
    "aaaa") keep every other match within each run.
  * Lineage is truncated with an eager ``localCheckpoint`` per
    iteration (the table is vocabulary-sized), the same O(rounds)
    containment as the connected-components loop.

Encoding reuses training: segment the DISTINCT words of the input with
the learned merges (rank order, same vectorized pass per merge), then
join segmentations back to the corpus — so encode cost is one
vocabulary-sized loop plus one join, never a per-document merge loop.

Determinism: ties on pair count break lexicographically (pair asc) —
pinned against a pure-Python reference implementation in
``tests/test_bpe.py`` (identical merge table, identical segmentations).

Reference parity: the reference pipeline has no tokenizer; this extends
its derived-column stage (``silver_glue_job.py:253-263``) in the
direction the north-star names — assembling training data, where the
tokenizer is learned from the corpus being assembled.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import BPE_ISH_RE

END_OF_WORD = "</w>"

_SYM_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType()),
        T.StructField("freq", T.LongType()),
        T.StructField("syms", T.ArrayType(T.StringType())),
    ]
)


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the ONLY corpus-sized pass. One
    explode + one map-side-combined shuffle keyed by word."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(wf: DataFrame) -> DataFrame:
    """word → its character symbols plus the end-of-word sentinel (the
    classic BPE word representation), pure Catalyst."""
    return wf.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair totals weighted by word freq — JVM-side explode of
    zip(syms[:-1], syms[1:]), one partial-agg shuffle."""
    n = F.size("syms")
    z = F.arrays_zip(
        F.slice(F.col("syms"), 1, n - 1).alias("p1"),
        F.slice(F.col("syms"), 2, n - 1).alias("p2"),
    )
    return (
        syms.filter(n >= 2)
        .select("freq", F.explode(z).alias("pr"))
        .groupBy(
            F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2")
        )
        .agg(F.sum("freq").alias("total"))
    )


def _greedy_merge_positions(match: np.ndarray) -> np.ndarray:
    """Indices selected by greedy left-to-right merging given the match
    mask over flat positions: every other match within each run of
    CONSECUTIVE matched positions (runs longer than 1 only occur for
    a == b; see module docstring)."""
    idx = np.nonzero(match)[0]
    if len(idx) == 0:
        return idx
    new_run = np.concatenate(([True], np.diff(idx) > 1))
    run_start = idx[new_run][np.cumsum(new_run) - 1]
    return idx[(idx - run_start) % 2 == 0]


def _apply_merge_batch(
    syms_list: np.ndarray, a: str, b: str
) -> tuple[np.ndarray, bool]:
    """One vectorized merge pass over a batch of symbol arrays: flatten,
    mask matches (excluding cross-word boundaries), resolve greedy
    overlap by run parity, rebuild per-word arrays via offset
    arithmetic. Returns (new arrays, changed)."""
    lens = np.fromiter((len(s) for s in syms_list), dtype=np.int64, count=len(syms_list))
    flat = np.concatenate(syms_list) if len(syms_list) else np.empty(0, object)
    flat = np.asarray(flat, dtype=object)
    bounds = np.concatenate(([0], np.cumsum(lens)))
    match = np.zeros(len(flat), dtype=bool)
    if len(flat) >= 2:
        match[:-1] = (flat[:-1] == a) & (flat[1:] == b)
    # a pair must live inside one word: kill matches at word boundaries
    match[bounds[1:] - 1] = False
    sel = _greedy_merge_positions(match)
    if len(sel) == 0:
        return syms_list, False
    flat = flat.copy()
    flat[sel] = a + b
    drop = np.zeros(len(flat), dtype=bool)
    drop[sel + 1] = True
    # new per-word lengths: each selected merge removes one symbol
    removed = np.zeros(len(syms_list), dtype=np.int64)
    np.add.at(removed, np.searchsorted(bounds[1:], sel, side="right"), 1)
    new_lens = lens - removed
    new_flat = flat[~drop]
    new_bounds = np.concatenate(([0], np.cumsum(new_lens)))
    out = np.empty(len(syms_list), dtype=object)
    for i in range(len(syms_list)):  # slice/list construction, not compute
        out[i] = list(new_flat[new_bounds[i] : new_bounds[i + 1]])
    return out, True


def _merge_udf(a: str, b: str):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            # np.empty+fill, NOT np.array(list-of-lists): equal-length
            # lists would silently build a 2-D char matrix
            syms = np.empty(len(pdf), dtype=object)
            for i, s in enumerate(pdf["syms"].to_numpy()):
                syms[i] = list(s)
            new_syms, _ = _apply_merge_batch(syms, a, b)
            yield pd.DataFrame(
                {"word": pdf["word"], "freq": pdf["freq"], "syms": new_syms}
            )

    return fn


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    min_count: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    list in rank order. Stops early when the best pair's count drops
    below ``min_count`` (merging hapax pairs memorizes noise)."""
    syms = _initial_symbols(word_freqs(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(syms)
            .orderBy(F.desc("total"), F.asc("p1"), F.asc("p2"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["total"] < min_count:
            break
        a, b = best[0]["p1"], best[0]["p2"]
        merges.append((a, b))
        # eager localCheckpoint: bounded lineage (vocab-sized table),
        # same containment as the connected-components rounds
        syms = syms.mapInPandas(
            _merge_udf(a, b), schema=_SYM_SCHEMA
        ).localCheckpoint()
    return merges


def segment_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word → tokens) for a DISTINCT-word frame by replaying the merge
    list in rank order — n_merges vectorized passes over a
    vocabulary-sized table, never a per-document loop."""
    syms = _initial_symbols(
        words.select("word").distinct().withColumn("freq", F.lit(1))
    )
    for i, (a, b) in enumerate(merges):
        syms = syms.mapInPandas(_merge_udf(a, b), schema=_SYM_SCHEMA)
        if (i + 1) % 8 == 0:
            syms = syms.localCheckpoint()
    return syms.select("word", F.col("syms").alias("tokens"))


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, tokens) — each document's BPE token sequence under the
    learned merges. Pre-tokens are segmented once per DISTINCT word
    (``segment_words``) and joined back by word, preserving document
    order via the pre-token position: encode cost is one
    vocabulary-sized merge replay + one join keyed by word, not a
    per-document merge loop. Documents with no pre-tokens yield an
    empty token array (kept, not dropped)."""
    words = docs.select(
        F.col(id_col),
        F.posexplode_outer(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)
        ).alias("pos", "word"),
    )
    seg = segment_words(words.filter(F.col("word").isNotNull()), merges)
    joined = words.join(seg, "word", "left")
    per_doc = (
        joined.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "tokens"))
            ).alias("ordered")
        )
        .select(
            id_col,
            F.flatten(
                F.filter("ordered", lambda s: s.tokens.isNotNull()).getField(
                    "tokens"
                )
            ).alias("tokens"),
        )
    )
    return per_doc.select(
        id_col, F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens")
    )
