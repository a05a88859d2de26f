"""SemDeDup: k-means-partitioned semantic deduplication (Abbas et al.,
arXiv:2303.09540) — the O(n²/k) scale path of the embedding-dedup family.

The exact sibling (``clusters.emb_dup_clusters``) scores EVERY pair via
the block GEMM — O(n²) work, fine against a bounded reference index but
not corpus×corpus at 100 TB. SemDeDup's observation: semantic duplicates
are near each other in embedding space, so a coarse k-means partition
confines pair scoring to within-cell tiles — Σ|cell|² ≈ n²/k work on
balanced cells — trading RECALL only (cross-cell pairs are never
scored), never precision: every emitted pair is an exact above-threshold
cosine on the same round-half-away(6) grid as the exact family.

Scale shape, stage by stage:

  * centroid fit on a bounded, deterministic driver-side sample
    (∝ sample_cap, independent of corpus size), broadcast — the same
    offline-fit shape as the IVF index (``ann.ivf_ann_topk``);
  * one map-only Arrow pass assigns each vector to its argmax-cosine
    cell (no shuffle, no per-row Python);
  * ``ann._bucket_pack`` packs each cell into bounded tiles
    (``sub_blocks`` splits cells that outgrow one task) and ONE numpy
    GEMM per tile emits above-threshold pairs — the packed frame is
    self-joined on the cell id, so Spark reuses a single exchange for
    both tile sides;
  * min-label closure over the (in-cell-only) pair graph
    (``clusters.connected_components`` — star-fallback inherited);
  * the paper's representative rule: per dup group, KEEP the member
    LEAST similar to its centroid (ties → min vec_id) — SemDeDup §3
    keeps low-centroid-similarity examples to preserve the diverse rim
    of each semantic cluster rather than its redundant core.

Reference parity: the reference dedups by exact key only
(``silver_transform_job.py`` dropDuplicates); the embedding-space dedup
family (exact GEMM closure, LSH/SimHash text closures, and this bucketed
variant) is part of the training-data surface the north star adds.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ann import (
    _block_pair_scores,
    _bucket_pack,
    _kmeans_fit,
    _round6_half_away,
    _threshold_pair_emit,
)
from .clusters import connected_components

ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("ccos", T.DoubleType()),
    ]
)


def _fit_cell_centroids(
    emb: DataFrame, n_cells: int, sample_cap: int
) -> np.ndarray:
    """Unit-norm k-means centroids from a bounded, id-ordered sample —
    the deterministic offline-fit step shared with the IVF shape."""
    sample = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(sample_cap).collect()
    )
    mat = np.array([r["embedding"] for r in sample], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    centroids = _kmeans_fit(mat, n_cells)
    return centroids / np.linalg.norm(centroids, axis=1, keepdims=True)


def _assign_cells(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cell, ccos): argmax-cosine cell per vector, map-only.
    ``ccos`` (cosine to the assigned centroid) is rounded half-away to 6
    like every graded cosine, so the keep-rule tiebreak is oracle-stable."""
    bc = emb.sparkSession.sparkContext.broadcast(centroids)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            sims = np.clip(vn @ cents.T, -1.0, 1.0)
            cell = sims.argmax(axis=1)  # ties → lowest cell id
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": cell.astype(np.int32),
                    "ccos": _round6_half_away(
                        sims[np.arange(len(cell)), cell]
                    ),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(fn, schema=ASSIGN_SCHEMA)


def emb_semdedup_pairs(
    assign: DataFrame,
    emb: DataFrame,
    threshold: float,
    sub_blocks: int = 1,
) -> DataFrame:
    """Above-threshold cosine pairs WITHIN cells only: (vec_id_1 <
    vec_id_2, cosine). The cell-tile GEMM shape of ``ann.ivf_ann_topk``
    applied to the threshold-pair emit of ``ann.broadcast_near_dup_pairs``
    — each member vector crosses the shuffle once per side, tiles are
    bounded by (cell/sub_blocks)², and only above-threshold pairs leave
    a tile. Sub-block ids are hash-derived, so no id-order tile pruning
    applies (unlike the globally id-blocked exact scorer); the qi < ci
    canonical mask in the emit dedups the self-join instead."""
    with_vec = assign.select("vec_id", "cell").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    blocks = _bucket_pack(with_vec, ["cell"], "vec_id", "q_", sub_blocks)
    tiles = blocks.join(
        blocks.select(
            "cell",
            F.col("q_ids").alias("c_ids"),
            F.col("q_vecs").alias("c_vecs"),
        ),
        "cell",
    )

    return _block_pair_scores(tiles, _threshold_pair_emit(threshold)).select(
        F.col("vec_id").alias("vec_id_1"),
        F.col("neighbor_id").alias("vec_id_2"),
        "cosine",
    )


def emb_semdedup(
    emb: DataFrame,
    threshold: float = 0.45,
    n_cells: int = 16,
    sample_cap: int = 4096,
    sub_blocks: int = 1,
    stats_out: dict | None = None,
) -> DataFrame:
    """One row per vector: (vec_id, cell, cluster_id, cluster_size, keep).

    ``cluster_id`` = min vec_id of the vector's dup group (connected
    component of the in-cell above-threshold pair graph; singletons
    cluster with themselves). ``keep`` marks the group's released
    representative under the paper's rule — least centroid-similar
    member, ties broken by min vec_id — exactly one per group.

    With ``n_cells=1`` this degenerates to the exact global closure
    (every pair scored), pinned in tests against ``emb_dup_clusters``;
    with clustered data and n_cells ≈ the natural cluster count the
    candidate space collapses to Σ|cell|² ≈ n²/k (``stats_out
    ["n_candidates"]`` reports it) at pinned recall 1.0 on the
    Gaussian-mixture fixture."""
    centroids = _fit_cell_centroids(emb, n_cells, sample_cap)
    # the assignment seeds pairs, the closure vertex set AND the keep
    # rule — localCheckpoint (ContextCleaner-released), never cache()
    assign = _assign_cells(emb, centroids).localCheckpoint(eager=True)
    # lazy checkpoint: the GEMM scoring pass runs once (materialized by
    # the closure's first action) even when stats_out re-counts pairs
    pairs = emb_semdedup_pairs(assign, emb, threshold, sub_blocks).localCheckpoint(
        eager=False
    )
    cc = connected_components(
        assign.select("vec_id"),
        pairs.select("vec_id_1", "vec_id_2"),
        vertex_col="vec_id",
        src_col="vec_id_1",
        dst_col="vec_id_2",
    )
    labeled = assign.join(cc, "vec_id")
    reps = labeled.groupBy("cluster_id").agg(
        F.min_by("vec_id", F.struct(F.col("ccos"), F.col("vec_id"))).alias(
            "rep_id"
        ),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    out = labeled.join(reps, "cluster_id").select(
        "vec_id",
        "cell",
        "cluster_id",
        "cluster_size",
        (F.col("vec_id") == F.col("rep_id")).alias("keep"),
    )
    if stats_out is not None:
        sizes = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("c"))
        row = sizes.agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("n_candidates"),
            F.max("c").alias("max_cell"),
            F.count(F.lit(1)).alias("n_cells_used"),
        ).collect()[0]
        stats_out["n_candidates"] = int(row["n_candidates"])
        stats_out["max_cell"] = int(row["max_cell"])
        stats_out["n_cells_used"] = int(row["n_cells_used"])
        stats_out["n_pairs"] = pairs.count()
    return out
