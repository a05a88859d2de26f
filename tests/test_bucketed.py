"""Bucketed co-located joins: the Exchange really disappears (plan
evidence, not folklore), results stay byte-identical to the shuffled
plan, the aggregation on the bucket key also skips its Exchange, and a
bucket-count mismatch degrades exactly one side."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    read_documents,
)
from crypto_near_real_time_data_ingestion_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(autouse=True)
def _no_auto_broadcast(spark):
    """The fixture tables are test-sized, so Spark would auto-broadcast
    the join (BroadcastExchange) and hide the layout effect under test;
    at the 100 TB scale bucketing targets, neither side broadcasts."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def bucketed_pair(spark):
    """Two tables bucketed on doc_id with equal counts (+ sortBy, which
    is what also removes the join's Sort nodes)."""
    tag = uuid.uuid4().hex[:8]
    docs = read_documents(spark, SF_DIR)
    left = docs.select("doc_id", "source", "text")
    right = docs.select("doc_id", F.length("text").alias("n_chars"))
    names = (f"docs_l_{tag}", f"docs_r_{tag}")
    write_bucketed(left, names[0], ["doc_id"], 8, sort_cols=["doc_id"])
    write_bucketed(right, names[1], ["doc_id"], 8, sort_cols=["doc_id"])
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_exchange_and_matches_shuffled(spark, bucketed_pair):
    l_name, r_name = bucketed_pair
    joined = bucketed_join(spark, l_name, r_name, ["doc_id"])
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan
    # identical rows to the plain (shuffled) dataframe join
    docs = read_documents(spark, SF_DIR)
    want = (
        docs.select("doc_id", "source", "text")
        .join(docs.select("doc_id", F.length("text").alias("n_chars")), "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = joined.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert got[want.columns.tolist()].equals(want)


def test_bucketed_groupby_skips_exchange(spark, bucketed_pair):
    """Aggregation keyed by the bucket column rides the same layout: no
    Exchange (the bucket files ARE the hash partitions)."""
    l_name, _ = bucketed_pair
    agg = spark.table(l_name).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert "Exchange" not in _plan(agg)


def test_bucket_count_mismatch_reshuffles_one_side_only(spark, bucketed_pair):
    """A 4-bucket right side joined to the 8-bucket left shuffles the
    mismatched side only — the left scan stays exchange-free."""
    l_name, _ = bucketed_pair
    tag = uuid.uuid4().hex[:8]
    other = f"docs_m_{tag}"
    docs = read_documents(spark, SF_DIR)
    write_bucketed(
        docs.select("doc_id", F.length("text").alias("n_chars")),
        other, ["doc_id"], 4, sort_cols=["doc_id"],
    )
    try:
        plan = _plan(bucketed_join(spark, l_name, other, ["doc_id"]))
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {other}")
