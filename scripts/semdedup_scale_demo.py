#!/usr/bin/env python
"""SemDeDup pruning demonstration: in-cell pair scoring vs the exact
global closure, SAME corpus, SAME resulting clusters.

The pytest pins run at 1k vectors where everything is overhead-
dominated. This script is the scale evidence: at 50k clustered vectors
(sf1.0 wide-noise fixture — 64 Gaussian clusters of ~780) the exact
family must score n² = 2.5e9 pairs while SemDeDup's k-means partition
confines scoring to Σ|cell|² ≈ n²/64 (~39e6, 1.6%) — and on this
corpus (cross-cluster cosine far below threshold) the resulting dup
clusters are IDENTICAL (asserted on every row), so the speedup is pure
partition pruning, not a different answer.

Run:  python scripts/semdedup_scale_demo.py       # ~2-4 min end to end
Output: one JSON line — recorded in BASELINE.md §SemDeDup.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = float(os.environ.get("SEMDEDUP_DEMO_SF", "1.0"))
REPS = int(os.environ.get("SEMDEDUP_DEMO_REPS", "2"))
# 0.95 keeps ~2.5% of in-cluster pairs (≈493k dup edges at 50k vectors
# — a realistic near-dup regime; 0.7 would make EVERY in-cluster pair a
# duplicate, ~19.5M edges, an all-dups corpus no one dedups) while
# staying far above the cross-cluster band (max ≈ 0.49)
THRESHOLD = 0.95
N_CELLS = 64


def main() -> None:
    from crypto_near_real_time_data_ingestion_spark.datagen import (
        ensure_clustered_embeddings,
    )
    from crypto_near_real_time_data_ingestion_spark.operators import semdedup
    from crypto_near_real_time_data_ingestion_spark.operators.clusters import (
        emb_dup_clusters,
    )
    from crypto_near_real_time_data_ingestion_spark.session import get_spark

    spark = get_spark("semdedup-scale-demo", cores=32)
    emb = spark.read.parquet(
        ensure_clustered_embeddings(SF, noise_scale=3.0)
    ).select("vec_id", "embedding")
    n = emb.count()

    def best_of(label: str, fn) -> float:
        times = []
        for _ in range(REPS):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(f"# {label}: {[round(t, 1) for t in times]}", file=sys.stderr)
        return min(times)

    stats: dict = {}
    sem_s = best_of(
        "semdedup",
        lambda: semdedup.emb_semdedup(
            emb, threshold=THRESHOLD, n_cells=N_CELLS
        ),
    )
    semdedup.emb_semdedup(
        emb, threshold=THRESHOLD, n_cells=N_CELLS, stats_out=stats
    ).write.format("noop").mode("overwrite").save()
    exact_s = best_of(
        "exact-closure", lambda: emb_dup_clusters(emb, threshold=THRESHOLD)
    )

    # same answer on every row (cluster ids + sizes; the exact op has no
    # keep column)
    got = (
        semdedup.emb_semdedup(emb, threshold=THRESHOLD, n_cells=N_CELLS)
        .select("vec_id", "cluster_id", "cluster_size")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype({"cluster_size": "int64"})
    )
    want = (
        emb_dup_clusters(emb, threshold=THRESHOLD)
        .select("vec_id", "cluster_id", "cluster_size")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype({"cluster_size": "int64"})
    )
    assert got.equals(want), "SemDeDup clusters diverged from the exact closure"

    print(
        json.dumps(
            {
                "metric": "semdedup_scale_demo",
                "sf": SF,
                "n_vectors": n,
                "pairs_bruteforce": n * (n - 1) // 2,
                "pairs_scored": stats["n_candidates"],
                "prune_frac": round(
                    stats["n_candidates"] / (n * (n - 1) / 2), 4
                ),
                "semdedup_s": round(sem_s, 1),
                "exact_s": round(exact_s, 1),
                "speedup": round(exact_s / sem_s, 2),
                "clusters_equal_exact": True,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
