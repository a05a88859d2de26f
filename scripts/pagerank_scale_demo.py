#!/usr/bin/env python
"""PageRank scale demonstration: the iterative join+agg rounds at 50k
nodes, with edges from the PRUNED ANN path and bit-exact invariance.

The graded entry runs at sf0.1 (2k vectors) where round overhead
dominates. This is the scale evidence: 50k clustered vectors (sf1.0
fixture), edges from branch-and-bound IVF (exact top-k, ~2% of the pair
space visited — the at-scale edge source; `scripts/ann_scale_demo.py`
pins its equality to brute force), then 5 integer fixed-point rounds.
The exact-regime claim is asserted AT THIS SCALE: ranks are
bit-identical under an adversarial repartition of nodes and edges, and
total mass is conserved up to floor losses.

Run:  python scripts/pagerank_scale_demo.py     # ~2-4 min
Output: one JSON line — recorded in BASELINE.md §25.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = float(os.environ.get("PR_DEMO_SF", "1.0"))


def main() -> None:
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.datagen import (
        ensure_clustered_embeddings,
    )
    from crypto_near_real_time_data_ingestion_spark.operators import ann, pagerank
    from crypto_near_real_time_data_ingestion_spark.session import get_spark

    from __spark_entry__ import IVF_CELLS, IVF_NPROBE

    spark = get_spark("pagerank-scale-demo", cores=32)
    emb = spark.read.parquet(ensure_clustered_embeddings(SF)).select(
        "vec_id", "embedding"
    )
    n = emb.count()

    t0 = time.time()
    edges = (
        ann.ivf_ann_topk(emb, n_cells=IVF_CELLS, nprobe=IVF_NPROBE)
        .select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
        .localCheckpoint(eager=True)
    )
    edge_s = time.time() - t0
    nodes = emb.select(F.col("vec_id").alias("node"))

    t0 = time.time()
    pr = pagerank.pagerank_fixed_point(nodes, edges).toPandas()
    pr_s = time.time() - t0

    # exact-regime evidence at scale: bit-identical under repartition
    pr2 = pagerank.pagerank_fixed_point(
        nodes.repartition(101), edges.repartition(67)
    ).toPandas()
    a = pr.sort_values("node").reset_index(drop=True)
    b = pr2.sort_values("node").reset_index(drop=True)
    assert a.equals(b), "ranks differ under repartition"
    total = int(pr.r.sum())
    assert total <= pagerank.SCALE

    print(
        json.dumps(
            {
                "metric": "pagerank_50k_knn",
                "n": n,
                "edges": n * pagerank.KNN_K,
                "edge_derivation_s": round(edge_s, 1),
                "pagerank_5_rounds_s": round(pr_s, 1),
                "per_round_s": round(pr_s / pagerank.N_ITER, 2),
                "mass_deficit_ppm": round(
                    (pagerank.SCALE - total) / pagerank.SCALE * 1e6, 3
                ),
                "partition_invariant": True,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
