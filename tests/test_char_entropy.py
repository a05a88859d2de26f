"""Character-entropy quality signal (`doc_char_entropy`): DuckDB value
oracle (ln venue → tolerance), hand-computed planted values, and the
filter-orientation contract."""

from __future__ import annotations

import math

import pytest

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    DOC_CHAR_ENTROPY_ORACLE_SQL,
    doc_char_entropy,
)


def test_char_entropy_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = doc_char_entropy(docs)
    want = duck_sql(DOC_CHAR_ENTROPY_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_char_entropy_planted_values(spark):
    docs = spark.createDataFrame(
        [
            (0, "aaaa"),          # one symbol: 0 nats
            (1, "ab"),            # two equiprobable: ln 2
            (2, "aabb"),          # still ln 2
            (3, ""),              # empty: 0 by convention
            (4, None),            # filtered
            (5, "aab"),           # -(2/3 ln 2/3 + 1/3 ln 1/3)
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: (r["n_chars"], r["n_distinct_chars"], r["char_entropy"])
        for r in doc_char_entropy(docs).collect()
    }
    assert set(rows) == {0, 1, 2, 3, 5}
    assert rows[0] == (4, 1, 0.0)
    assert rows[1][0:2] == (2, 2)
    assert rows[1][2] == pytest.approx(math.log(2))
    assert rows[2][2] == pytest.approx(math.log(2))
    assert rows[3] == (0, 0, 0.0)
    assert rows[5][2] == pytest.approx(
        -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    )


def test_char_entropy_orientation(spark):
    """Repetitive padding scores below prose, prose below uniform junk —
    the property the quality filter relies on."""
    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),
            (1, "The quick brown fox jumps over the lazy dog."),
            (2, "qW3$zR8@pL1!xK9#mT5%vB7&nH2*"),
        ],
        "doc_id bigint, text string",
    )
    e = {
        r["doc_id"]: r["char_entropy"]
        for r in doc_char_entropy(docs).collect()
    }
    assert e[0] < e[1] < e[2]
