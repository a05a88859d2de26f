"""SemDeDup (k-means-partitioned semantic dedup): exactness of every
stage against a pure-numpy re-derivation, degeneration to the exact
global closure at n_cells=1, the recall-1.0 + candidate-pruning pin on
the clustered fixture, and tile-partitioning invariance.

Fixture: the noise_scale=3.0 Gaussian mixture (in-cluster cosine gaps
O(1e-3) — safely above the round-6 grid the keep-rule tiebreaks on;
the default fixture's 1e-5 gaps sit AT the grid and cannot pin a
centroid-similarity ordering)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from crypto_near_real_time_data_ingestion_spark.datagen import (
    ensure_clustered_embeddings,
)
from crypto_near_real_time_data_ingestion_spark.operators import ann, semdedup
from crypto_near_real_time_data_ingestion_spark.operators.clusters import (
    emb_dup_clusters,
)

SF = 0.001  # 1024 vectors, 64 planted clusters of 16
NOISE = 3.0
# measured on the fixture: in-cluster pair cosine min 0.8206, cross-
# cluster max 0.4947 — 0.7 splits the bands with wide margin both ways,
# so every planted cluster is exactly one dup group
THRESHOLD = 0.7
N_CELLS = 64


def _emb(spark):
    return spark.read.parquet(
        ensure_clustered_embeddings(SF, noise_scale=NOISE)
    ).select("vec_id", "embedding")


def _numpy_semdedup(pdf: pd.DataFrame, n_cells: int, sample_cap: int = 4096):
    """Independent re-derivation: same sample/fit entry points, then
    full-matrix assignment, brute-force in-cell pairs, union-find
    closure, and the paper keep rule — no Spark machinery anywhere."""
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    cents = ann._kmeans_fit(vn[:sample_cap].copy(), n_cells)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims_c = np.clip(vn @ cents.T, -1.0, 1.0)
    cell = sims_c.argmax(axis=1)
    ccos = ann._round6_half_away(sims_c[np.arange(len(cell)), cell])
    # brute-force pair graph, in-cell only, on the raw-vector formula
    # the tile GEMM uses (dot / sqrt(ssq·ssq))
    norms = np.sqrt((v * v).sum(axis=1))
    sims = ann._round6_half_away((v @ v.T) / np.outer(norms, norms))
    same_cell = cell[:, None] == cell[None, :]
    upper = np.triu(np.ones_like(same_cell), k=1).astype(bool)
    adj = same_cell & upper & (sims >= THRESHOLD)
    # union-find min-label closure
    parent = np.arange(len(ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(*np.nonzero(adj)):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    root = np.array([find(i) for i in range(len(ids))])
    cluster_id = ids[root]  # ids are sorted ⇒ min index = min id
    rows = pd.DataFrame(
        {"vec_id": ids, "cell": cell, "cluster_id": cluster_id, "ccos": ccos}
    )
    sizes = rows.groupby("cluster_id")["vec_id"].transform("size")
    rows["cluster_size"] = sizes
    rep = (
        rows.sort_values(["ccos", "vec_id"])
        .groupby("cluster_id")["vec_id"]
        .first()
    )
    rows["keep"] = rows["vec_id"].to_numpy() == rep[rows["cluster_id"]].to_numpy()
    return (
        rows[["vec_id", "cell", "cluster_id", "cluster_size", "keep"]]
        .sort_values("vec_id")
        .reset_index(drop=True)
    ), adj, ids


def test_semdedup_matches_numpy_oracle(spark):
    emb = _emb(spark)
    got = (
        semdedup.emb_semdedup(emb, threshold=THRESHOLD, n_cells=N_CELLS)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want, _, _ = _numpy_semdedup(emb.toPandas(), N_CELLS)
    for c in ("cell", "cluster_size"):
        got[c] = got[c].astype(want[c].dtype)
    pd.testing.assert_frame_equal(got, want)
    # non-vacuity: the fixture actually dedups (64 groups of 16)
    assert got["keep"].sum() == 64
    assert (got.groupby("cluster_id")["keep"].sum() == 1).all()


def test_semdedup_recall_1_and_pruning_on_clustered(spark):
    """With one cell per planted cluster, the in-cell pair graph equals
    the GLOBAL exact pair graph (recall 1.0) while the candidate space
    collapses to Σ|cell|² ≈ n²/k — the SemDeDup trade measured."""
    emb = _emb(spark)
    stats: dict = {}
    semdedup.emb_semdedup(
        emb, threshold=THRESHOLD, n_cells=N_CELLS, stats_out=stats
    )
    n = emb.count()
    got_pairs = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in semdedup.emb_semdedup_pairs(
            semdedup._assign_cells(
                emb, semdedup._fit_cell_centroids(emb, N_CELLS, 4096)
            ),
            emb,
            THRESHOLD,
        ).collect()
    }
    global_pairs = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in ann.broadcast_near_dup_pairs(emb, THRESHOLD).collect()
    }
    assert got_pairs == global_pairs  # subset always; equality = recall 1.0
    assert len(global_pairs) == 64 * 16 * 15 // 2
    # candidate pruning: ~n²/64 of the all-pairs space
    assert stats["n_candidates"] <= 0.03 * n * (n - 1) / 2
    assert stats["n_pairs"] == len(global_pairs)


def test_semdedup_single_cell_is_exact_global_closure(spark):
    """n_cells=1 scores every pair — the closure must coincide with the
    exact family member (emb_dup_clusters) row for row."""
    emb = _emb(spark)
    got = (
        semdedup.emb_semdedup(emb, threshold=THRESHOLD, n_cells=1)
        .select("vec_id", "cluster_id", "cluster_size")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = (
        emb_dup_clusters(emb, threshold=THRESHOLD)
        .select("vec_id", "cluster_id", "cluster_size")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"cluster_size": "int64"}),
        want.astype({"cluster_size": "int64"}),
    )


def test_semdedup_sub_blocks_invariant(spark):
    """Splitting cells into hash sub-tiles (the bounded-tile-memory path
    for cells that outgrow one task) must not change a single row."""
    emb = _emb(spark)
    whole = (
        semdedup.emb_semdedup(emb, threshold=THRESHOLD, n_cells=N_CELLS)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    split = (
        semdedup.emb_semdedup(
            emb, threshold=THRESHOLD, n_cells=N_CELLS, sub_blocks=3
        )
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(split, whole)
