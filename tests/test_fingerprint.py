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
    assert _fp(dup) != base
    # the SUM fold (not XOR) keeps even multiplicities visible: {A,A}
    # vs {C,C} must differ even at equal n_rows
    one = spark.createDataFrame([(1, "a")], "id long, v string")
    other = spark.createDataFrame([(2, "b")], "id long, v string")
    assert _fp(one.union(one), ["id", "v"]) != _fp(
        other.union(other), ["id", "v"]
    )
    # column-order is part of the identity
    assert _fp(docs, ["source", "doc_id", "lang"]) != base
    # delimiter escaping: a '|' inside a value cannot alias a column
    # boundary — ('x|y','z') and ('x','y|z') are different datasets
    p1 = spark.createDataFrame([("x|y", "z")], "a string, b string")
    p2 = spark.createDataFrame([("x", "y|z")], "a string, b string")
    assert _fp(p1, ["a", "b"]) != _fp(p2, ["a", "b"])


def test_fingerprint_null_canonicalization(spark):
    """NULL, the empty string, and the literal backslash-N string are
    three DIFFERENT datasets: escaping renders a literal backslash as
    a double, so no value can collide with the bare NULL token — and
    the DuckDB twin agrees on the escaped forms too."""
    a = spark.createDataFrame([(1, None)], "id long, v string")
    b = spark.createDataFrame([(1, "")], "id long, v string")
    c = spark.createDataFrame([(1, "\\N")], "id long, v string")
    fa, fb, fc = (_fp(x, ["id", "v"]) for x in (a, b, c))
    assert len({fa, fb, fc}) == 3
    # cross-engine parity on values that NEED escaping
    docs_sql = (
        "SELECT doc_id, source || '|' || lang AS piped,"
        " '\\' || lang AS slashed FROM documents"
    )
    got = duck_sql(
        fingerprint_oracle_sql(docs_sql, ["doc_id", "piped", "slashed"])
    ).iloc[0]
    spark_side = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            F.concat_ws("|", "source", "lang").alias("piped"),
            F.concat(F.lit("\\"), F.col("lang")).alias("slashed"),
        )
    )
    assert _fp(spark_side, ["doc_id", "piped", "slashed"]) == (
        int(got["n_rows"]),
        int(got["fingerprint"]),
    )
