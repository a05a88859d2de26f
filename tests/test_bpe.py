"""Distributed BPE == the classic sequential algorithm (Sennrich 2016).

The Spark loop (`operators/bpe.py`) must learn the IDENTICAL merge
table a pure-Python reference learns from the same word frequencies
(same greedy left-to-right merge semantics, same count-desc /
pair-lexicographic tiebreak), segment every distinct word identically,
and encode documents to the reference token sequences. The word-freq
pass itself is oracle-checked against DuckDB over the same regex.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from conftest import SF_DIR, assert_df_equal
from crypto_near_real_time_data_ingestion_spark.functions.text import BPE_ISH_RE
from crypto_near_real_time_data_ingestion_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
    segment_words,
    word_freqs,
)
from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    read_documents,
)

# ---------------------------------------------------------------- reference


def _ref_apply(s: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _ref_train(wf: dict[str, int], n_merges: int, min_count: int = 2):
    vocab = {w: list(w) + [END_OF_WORD] for w in wf}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in wf.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        maxc = max(counts.values())
        if maxc < min_count:
            break
        a, b = min(p for p, c in counts.items() if c == maxc)
        merges.append((a, b))
        vocab = {w: _ref_apply(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def _ref_tokenize(text: str, seg: dict[str, list[str]]) -> list[str]:
    import re

    return [
        t
        for w in re.findall(BPE_ISH_RE, text or "")
        for t in seg[w]
    ]


# ------------------------------------------------------------------- tests


def test_word_freqs_match_duckdb(spark):
    got = word_freqs(read_documents(spark, SF_DIR))
    want = duckdb.sql(
        f"""
        SELECT word, COUNT(*)::BIGINT AS freq
        FROM (SELECT unnest(regexp_extract_all(text, '{BPE_ISH_RE}')) AS word
              FROM read_parquet('{SF_DIR}/documents.parquet')
              WHERE text IS NOT NULL)
        GROUP BY word
        """
    ).df()
    assert_df_equal(got, want, sort_cols=["word"])


def test_train_matches_reference_on_corpus(spark):
    docs = read_documents(spark, SF_DIR)
    wf = {
        r["word"]: r["freq"] for _, r in word_freqs(docs).toPandas().iterrows()
    }
    want_merges, want_vocab = _ref_train(wf, n_merges=30)
    got_merges = bpe_train(docs, n_merges=30)
    assert len(want_merges) == 30, "fixture must support 30 informative merges"
    assert got_merges == want_merges

    # every distinct word segments identically under the learned table
    seg = segment_words(
        spark.createDataFrame([(w,) for w in wf], "word string"), got_merges
    ).toPandas()
    got_seg = {r["word"]: list(r["tokens"]) for _, r in seg.iterrows()}
    assert got_seg == want_vocab


def test_greedy_overlap_and_ties_match_reference(spark):
    """Runs of a == b ('aaaa' → 'aa','aa'; 'aaaaa' → 'aa','aa','a</w>')
    exercise the run-parity rule against the reference's left-to-right
    walk, and equal counts exercise the lexicographic tiebreak."""
    rows = [(i, t) for i, t in enumerate(
        ["aaaa aaaa aaaaa", "bbbb aaaa", "cc cc cc dd dd dd"] * 3
    )]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf = {
        r["word"]: r["freq"] for _, r in word_freqs(docs).toPandas().iterrows()
    }
    want_merges, want_vocab = _ref_train(wf, n_merges=8)
    got = bpe_train(docs, n_merges=8)
    assert got == want_merges
    seg = segment_words(
        spark.createDataFrame([(w,) for w in wf], "word string"), got
    ).toPandas()
    assert {r["word"]: list(r["tokens"]) for _, r in seg.iterrows()} == want_vocab


def test_encode_matches_reference_tokens(spark):
    docs = read_documents(spark, SF_DIR).limit(80)
    merges = bpe_train(read_documents(spark, SF_DIR), n_merges=20)
    pdf = docs.select("doc_id", "text").toPandas()
    wf = {
        r["word"]: r["freq"]
        for _, r in word_freqs(read_documents(spark, SF_DIR)).toPandas().iterrows()
    }
    _, vocab = _ref_train(wf, n_merges=20)
    got = {
        r["doc_id"]: list(r["tokens"])
        for _, r in bpe_encode(docs, merges).toPandas().iterrows()
    }
    for _, r in pdf.iterrows():
        assert got[r["doc_id"]] == _ref_tokenize(r["text"], vocab), r["doc_id"]
    assert len(got) == len(pdf)


def test_min_count_stops_early(spark):
    """Every pair unique ⇒ best count 1 < min_count ⇒ zero merges."""
    docs = spark.createDataFrame([(0, "abc def")], "doc_id long, text string")
    assert bpe_train(docs, n_merges=5, min_count=2) == []


def test_encode_handles_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        [(0, "cc cc"), (1, ""), (2, None)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=2, min_count=2)
    got = (
        bpe_encode(docs, merges)
        .toPandas()
        .set_index("doc_id")["tokens"]
        .to_dict()
    )
    assert list(got[1]) == [] and list(got[2]) == []
    assert len(got[0]) > 0
