"""D4 — document de-duplication and diversification (Tirumala et al.,
arXiv:2308.12284): the published composition on top of SemDeDup.

D4's recipe: (1) near-dup removal (SemDeDup — here
``semdedup.emb_semdedup``, which already keeps each dup group's
least-centroid-similar representative), then (2) **SSL-prototypes
pruning** — re-cluster the deduplicated survivors and drop the most
PROTOTYPICAL fraction of every cluster (highest cosine to its
centroid): after duplicates are gone, the residual redundancy is the
dense core of each semantic cluster, and removing it preserves the
diverse rim. Step 2's re-fit runs on the FULL kept set via the
distributed Lloyd's fit (``kmeans.kmeans_fit``) — D4 re-clusters after
dedup precisely because dedup moves the density landscape, and the
kept set at 100 TB no longer resembles any bounded sample of the raw
corpus.

Scale shape: SemDeDup keeps its Σ|cell|²≈n²/k tile bound; the re-fit
is n_iter map-only scans with ≤ k partials per batch (see
``kmeans.py``); prototype assignment is one map-only Arrow pass; the
per-cluster trim ranks within cells — ONE exchange keyed by cell plus
an in-partition sort (m_cell = ⌊frac·|cell|⌋ varies per cell, so the
fixed-k map-side trim of ``grouped_topk`` does not apply; the broadcast
m-table keeps the decision a map-side comparison after the rank).

Determinism: ccos is the family's round-half-away(6) cosine
(``ann._round6_half_away`` via ``semdedup._assign_cells``); the drop
rank orders (ccos DESC, vec_id ASC), so the output is unique and
engine-stable. Reference parity: the reference has no embedding ops;
this extends the north star's curation family with the named
diversification step its dedup ops feed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kmeans import kmeans_fit
from .semdedup import _assign_cells, emb_semdedup

D4_PROTO_FRAC = 0.25


def emb_d4_select(
    emb: DataFrame,
    threshold: float = 0.45,
    n_cells: int = 16,
    proto_frac: float = D4_PROTO_FRAC,
    proto_cells: int | None = None,
    kmeans_iter: int = 10,
    sub_blocks: int = 1,
) -> DataFrame:
    """One row per SemDeDup-kept vector: (vec_id, proto_cell, ccos,
    selected). ``selected`` is False for the ⌊proto_frac·|cell|⌋ most
    prototypical members of each re-fit cluster (highest round6 cosine
    to centroid, ties dropped lowest-vec_id first), True otherwise —
    D4's released set is ``selected``.

    ``proto_cells`` defaults to ``n_cells``; ``proto_frac`` ∈ [0, 1]
    (0 = SemDeDup only, 1 = drop every clustered point)."""
    if not 0.0 <= proto_frac <= 1.0:
        raise ValueError(f"proto_frac must be in [0, 1], got {proto_frac}")
    kept_ids = emb_semdedup(
        emb, threshold=threshold, n_cells=n_cells, sub_blocks=sub_blocks
    ).filter("keep").select("vec_id")
    # the kept set feeds kmeans_iter+2 scans (init + n_iter fit passes +
    # assignment) — cut the semdedup tail out of every one of them
    # (localCheckpoint, ContextCleaner-released — the semdedup precedent)
    kept = (
        emb.join(kept_ids, "vec_id")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    # re-fit on the FULL deduplicated set (distributed Lloyd's), unit-
    # normalized centroids for the cosine assignment
    k = n_cells if proto_cells is None else proto_cells
    cents = kmeans_fit(kept, k, n_iter=kmeans_iter, normalize=True)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    # consumed twice (sizes agg + rank) — one map-only pass, materialized
    assign = _assign_cells(kept, cents).localCheckpoint(eager=True)
    sizes = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    m = sizes.select(
        "cell", F.floor(F.lit(float(proto_frac)) * F.col("n")).alias("m")
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("ccos").desc(), F.col("vec_id").asc()
    )
    return (
        assign.withColumn("proto_rank", F.row_number().over(w))
        .join(F.broadcast(m), "cell")
        .select(
            "vec_id",
            F.col("cell").alias("proto_cell"),
            "ccos",
            (F.col("proto_rank") > F.col("m")).alias("selected"),
        )
    )
