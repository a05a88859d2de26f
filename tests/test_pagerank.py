"""Integer fixed-point PageRank: oracle parity, exact-regime
determinism (partition invariance), mass conservation, and guards."""

from __future__ import annotations

import pandas as pd
import pytest

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.operators import pagerank
from crypto_near_real_time_data_ingestion_spark.plans import documents_gold as dg


def _emb(spark):
    return dg.read_embeddings(spark, SF_DIR)


def test_emb_knn_pagerank_oracle(spark):
    got = pagerank.emb_knn_pagerank(_emb(spark))
    want = duck_sql(pagerank.emb_knn_pagerank_oracle_sql())
    assert_df_equal(got, want, sort_cols=["vec_id"])


def test_partition_invariance(spark):
    """The exact-regime claim: integer shares are computed per edge
    BEFORE aggregation, so the result is bit-identical under any
    partitioning of nodes and edges."""
    emb = _emb(spark)
    base = pagerank.emb_knn_pagerank(emb).toPandas().sort_values("vec_id")
    skewed = pagerank.emb_knn_pagerank(emb.repartition(37)).toPandas().sort_values(
        "vec_id"
    )
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), skewed.reset_index(drop=True)
    )


def test_mass_conservation_bound(spark):
    """Total fixed-point mass never exceeds SCALE (floor division only
    shrinks) and stays close to it (each of the n_iter rounds loses at
    most ~1 unit per edge/node to flooring)."""
    pr = pagerank.emb_knn_pagerank(_emb(spark)).toPandas()
    total = int(pr.pr.sum())
    n = len(pr)
    # per-round floor loss ≤ (k+2)·n units (one per edge share, one per
    # teleport, one per node init), compounded by the 0.85 damping tail
    # (Σ 0.85^i < 1/0.15 ≈ 6.7) — a generous but ≪-SCALE bound
    slack = 7 * pagerank.N_ITER * (pagerank.KNN_K + 2) * n
    assert total <= pagerank.SCALE
    assert total >= pagerank.SCALE - slack
    assert (pr.pr > 0).all()


def test_dangling_free_teleport_floor(spark):
    """Every node receives at least the teleport mass; a node with no
    in-edges receives exactly it."""
    emb = _emb(spark)
    pr = pagerank.emb_knn_pagerank(emb).toPandas()
    n = len(pr)
    tele = (15 * pagerank.SCALE) // (100 * n)
    assert int(pr.pr.min()) >= tele


def test_shuffle_branch_bit_equals_broadcast(spark):
    """Execute the >broadcast_nodes_max keyed-shuffle branch (threshold
    forced to 0, auto-broadcast disabled so the joins PHYSICALLY shuffle,
    not just lose the hint) and pin bit-equality with the broadcast
    branch — the docstring's 'results identical either way' claim
    executed, not asserted."""
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.operators import ann

    emb = _emb(spark)
    edges = ann.broadcast_cosine_topk(emb, k=pagerank.KNN_K).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    ).localCheckpoint(eager=True)
    nodes = emb.select(F.col("vec_id").alias("node"))
    bc = pagerank.pagerank_fixed_point(nodes, edges, n_iter=2).toPandas()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sh = pagerank.pagerank_fixed_point(
            nodes, edges, n_iter=2, broadcast_nodes_max=0
        ).toPandas()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    pd.testing.assert_frame_equal(
        bc.sort_values("node").reset_index(drop=True),
        sh.sort_values("node").reset_index(drop=True),
    )


def test_empty_nodes_raise(spark):
    nodes = spark.createDataFrame([], "node long")
    edges = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty node set"):
        pagerank.pagerank_fixed_point(nodes, edges)


SEED_MAX = 50  # vec_id < 50 → the vetted seed slice


def test_emb_knn_trustrank_oracle(spark):
    """Seed-restricted teleport (TrustRank) vs the gated chained-CTE
    DuckDB oracle — exact integer regime, like the uniform PageRank."""
    got = pagerank.emb_knn_trustrank(_emb(spark), SEED_MAX)
    want = duck_sql(pagerank.emb_knn_trustrank_oracle_sql(SEED_MAX))
    assert_df_equal(got, want, sort_cols=["vec_id"])


def test_trustrank_mass_flows_from_seeds(spark):
    """Trust semantics: seeds hold at least the teleport floor, total
    mass is bounded by SCALE, and unreachable non-seeds score zero
    while seed-adjacent nodes score positive."""
    emb = _emb(spark)
    tr = pagerank.emb_knn_trustrank(emb, SEED_MAX).toPandas()
    n_seed = int((tr.vec_id < SEED_MAX).sum())
    tele = (15 * pagerank.SCALE) // (100 * n_seed)
    seeds = tr[tr.vec_id < SEED_MAX]
    assert (seeds.trust >= tele).all()
    assert int(tr.trust.sum()) <= pagerank.SCALE
    non_seed = tr[tr.vec_id >= SEED_MAX]
    # on the k-NN graph some non-seeds receive trust, and (unlike the
    # uniform PageRank) trust is NOT guaranteed everywhere
    assert (non_seed.trust > 0).any()
    assert int(non_seed.trust.min()) == 0 or len(non_seed) == 0


def test_trustrank_empty_seeds_raise(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="empty seed set"):
        pagerank.emb_knn_trustrank(emb, -1)
