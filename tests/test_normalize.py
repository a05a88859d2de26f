"""Text normalization (`doc_normalize`): DuckDB staged oracle on the
driver corpus (clean ASCII there — the PII-scrub precedent: the fixture
proves the pass-through, a planted fixture proves every rule fires),
plus idempotence and dedup-key stability."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    DOC_NORMALIZE_ORACLE_SQL,
    doc_normalize,
)

PLANTED = [
    (0, "‘curly’ “quotes” – and — dash…"),
    (1, "ctrl\x00chars\x07here\x7f"),
    (2, "runs   of\t\tspaces"),
    (3, "  spaces around \n  newlines  "),
    (4, "blank\n\n\n\n\nruns"),
    (5, "already clean"),
    (6, "nbsp\u00a0here"),
    (7, None),
    (8, "crlf\r\nline\r\n\r\n\r\nend\r"),
]


@pytest.fixture(scope="module")
def planted_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("norm") / "documents.parquet")
    spark.createDataFrame(PLANTED, "doc_id bigint, text string").write.parquet(p)
    return p


def test_normalize_matches_oracle_on_driver_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = doc_normalize(docs)
    want = duck_sql(DOC_NORMALIZE_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_normalize_matches_oracle_on_planted(spark, planted_parquet):
    got = doc_normalize(spark.read.parquet(planted_parquet))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_parquet}/*.parquet')"
    )
    want = con.execute(DOC_NORMALIZE_ORACLE_SQL).df()
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_normalize_planted_values(spark, planted_parquet):
    rows = {
        r["doc_id"]: (r["text_norm"], r["n_ctrl"], r["changed"])
        for r in doc_normalize(spark.read.parquet(planted_parquet)).collect()
    }
    assert rows[0] == ("'curly' \"quotes\" - and - dash.", 0, True)
    assert rows[1] == ("ctrlcharshere", 3, True)
    assert rows[2] == ("runs of spaces", 0, True)
    assert rows[3] == ("spaces around\nnewlines", 0, True)
    assert rows[4] == ("blank\n\nruns", 0, True)
    assert rows[5] == ("already clean", 0, False)
    assert rows[6] == ("nbsp here", 0, True)  # NBSP → space: same length
    assert 7 not in rows
    # \r is a stripped control char: CRLF corpora normalize to the same
    # md5 dedup keys as LF ones, and the blank-run cap sees the \n runs
    assert rows[8] == ("crlf\nline\n\nend", 5, True)


def test_normalize_idempotent(spark, planted_parquet):
    """Normalizing a normalized corpus is a no-op — required for the
    md5-keyed dedup grains to be stable across pipeline re-runs."""
    once = doc_normalize(spark.read.parquet(planted_parquet)).select(
        "doc_id", F.col("text_norm").alias("text")
    )
    twice = doc_normalize(once)
    diff = twice.filter(F.col("text_norm") != F.col("text")).count()
    assert diff == 0
