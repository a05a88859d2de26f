"""Deterministic epoch shuffle: DuckDB value oracle (pure integer/string
columns — exact), permutation validity, seed sensitivity + reproducibility,
shard balance, and the no-global-sort plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    doc_epoch_shuffle,
    doc_epoch_shuffle_oracle_sql,
    read_documents,
)


def test_epoch_shuffle_matches_oracle(spark):
    docs = read_documents(spark, SF_DIR)
    for seed in (0, 3):
        got = doc_epoch_shuffle(docs, seed=seed)
        want = duck_sql(doc_epoch_shuffle_oracle_sql(seed=seed))
        assert_df_equal(got, want, sort_cols=["doc_id"])


def test_epoch_shuffle_is_a_permutation(spark):
    """Every doc appears exactly once; within each shard, pos is dense
    0..len-1 — a reader streaming shards by pos sees each doc once."""
    docs = read_documents(spark, SF_DIR)
    pdf = doc_epoch_shuffle(docs).toPandas()
    n_docs = docs.filter(F.col("text").isNotNull()).count()
    assert len(pdf) == n_docs == pdf["doc_id"].nunique()
    for _, g in pdf.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))


def test_epoch_shuffle_seed_sensitivity(spark):
    """Same seed reproduces the identical permutation; a different seed
    re-deals both the shard assignment and the within-shard order."""
    docs = read_documents(spark, SF_DIR)
    a1 = doc_epoch_shuffle(docs, seed=1).toPandas().sort_values("doc_id")
    a2 = doc_epoch_shuffle(docs, seed=1).toPandas().sort_values("doc_id")
    b = doc_epoch_shuffle(docs, seed=2).toPandas().sort_values("doc_id")
    assert a1.reset_index(drop=True).equals(a2.reset_index(drop=True))
    changed = (a1["shard"].to_numpy() != b["shard"].to_numpy()) | (
        a1["pos"].to_numpy() != b["pos"].to_numpy()
    )
    assert changed.mean() > 0.5  # a re-deal, not a perturbation


def test_epoch_shuffle_balance_and_plan(spark):
    """The 32-bit shard draw keeps any small n_shards binomial-tight; and
    the executed plan's only exchange is hashpartitioning on shard — no
    single-partition global sort anywhere."""
    docs = read_documents(spark, SF_DIR)
    df = doc_epoch_shuffle(docs, n_shards=8)
    counts = [r["c"] for r in df.groupBy("shard").agg(F.count(F.lit(1)).alias("c")).collect()]
    assert len(counts) == 8
    assert max(counts) < 2 * min(counts)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan
