"""Connected components over the near-duplicate pair graph.

The step after pair generation in every large-scale dedup pipeline:
near-dup PAIRS (from MinHash-LSH / SimHash / embedding cosine) must be
closed into CLUSTERS so one canonical document per component survives.

Spark-first formulation: iterative min-label propagation —

    label(v) ← min(label(v), min over neighbors' labels)

repeated until fixpoint. Each round is ONE hash-aggregated join
(shuffle ∝ edges) and converges in O(component diameter) rounds; for
near-dup graphs the diameter is tiny (dup clusters are cliques or short
chains), so 2–4 rounds is typical. Lineage is truncated per round with
``localCheckpoint`` — without it the loop builds an exponentially
nested plan (the classic iterative-algorithm trap on Spark). At
100 TB-scale edge counts the same loop holds; the large-star/small-star
variant (Kiveris et al.) halves rounds on adversarial chains but the
per-round shape — join, min-agg, compare — is identical.

The driver grades this against a DuckDB ``WITH RECURSIVE`` transitive
min-label closure — an independent formulation of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "doc_id",
    src_col: str = "doc_id_1",
    dst_col: str = "doc_id_2",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, cluster_id) with cluster_id = min vertex id reachable in
    the undirected graph; singletons cluster with themselves."""
    sym = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .union(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(vertex_col).alias("v"), F.col(vertex_col).alias("label")
    ).localCheckpoint()

    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.dst == labels.v)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.v == nbr_min.src, "left")
            .select(
                "v",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # truncate lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed > 0:
        # a silent exit here would return WRONG labels for any component
        # whose min-label eccentricity exceeds max_iter — fail loudly so
        # non-convergence can't masquerade as a result (raise max_iter,
        # or switch to the large-star/small-star variant, to converge)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — raise max_iter"
        )

    return labels.select(
        F.col("v").alias(vertex_col), F.col("label").alias("cluster_id")
    )


def doc_dup_clusters(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-dup clusters over the MinHash-LSH verified pair graph (the
    scale path — candidates via band buckets, exact-Jaccard verified,
    then closed into components). Output: (doc_id, cluster_id,
    cluster_size); singleton docs form their own cluster."""
    from .text_dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, threshold).select("doc_id_1", "doc_id_2")
    vertices = docs.filter(F.col("text").isNotNull()).select("doc_id")
    cc = connected_components(vertices, pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")


def emb_dup_clusters(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """SEMANTIC dedup closure: connected components over the
    embedding-cosine near-duplicate pair graph — the embedding-space
    sibling of ``doc_dup_clusters`` (text/MinHash space). Together they
    complete the dedup family: exact → n-gram → MinHash-LSH → SimHash →
    embedding-cosine, each with pair AND cluster forms.

    Pairs come from the distributed block-GEMM scorer
    (``operators/ann.broadcast_near_dup_pairs`` — no driver collect,
    tile-bounded memory), so the whole plan is cluster-shaped: shuffle
    ∝ edges, O(diameter) rounds. Output: (vec_id, cluster_id,
    cluster_size); vectors with no near-dup form singleton clusters."""
    from .ann import broadcast_near_dup_pairs

    pairs = broadcast_near_dup_pairs(emb, threshold).select(
        F.col("vec_id_1"), F.col("vec_id_2")
    )
    vertices = emb.select("vec_id")
    cc = connected_components(
        vertices, pairs, vertex_col="vec_id",
        src_col="vec_id_1", dst_col="vec_id_2",
    )
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select("vec_id", "cluster_id", "cluster_size")


def emb_dup_clusters_oracle_sql(threshold: float = 0.45) -> str:
    """DuckDB recursive min-label closure over the exact cosine pairs
    (the same pair oracle that grades ``emb_near_dup``)."""
    from ..plans.documents_gold import EMB_NEAR_DUP_ORACLE_SQL_TEMPLATE

    pairs = EMB_NEAR_DUP_ORACLE_SQL_TEMPLATE.format(threshold=threshold)
    return f"""
WITH RECURSIVE pairs AS (
    SELECT vec_id_1, vec_id_2 FROM ({pairs}) np
),
edges AS (
    SELECT vec_id_1 AS src, vec_id_2 AS dst FROM pairs
    UNION ALL
    SELECT vec_id_2, vec_id_1 FROM pairs
),
verts AS (SELECT vec_id FROM embeddings),
reach AS (
    SELECT vec_id, vec_id AS label FROM verts
    UNION
    SELECT e.src AS vec_id, r.label
    FROM reach r JOIN edges e ON e.dst = r.vec_id
),
cc AS (SELECT vec_id, min(label) AS cluster_id FROM reach GROUP BY vec_id)
SELECT vec_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cc
"""


def dup_clusters_oracle_sql(threshold: float = 0.5) -> str:
    """DuckDB recursive transitive min-label closure over the EXACT
    Jaccard pairs (== the verified LSH pairs at pinned recall 1.0)."""
    from ..plans.documents_gold import DOC_JACCARD_ORACLE_SQL_TEMPLATE

    pairs = DOC_JACCARD_ORACLE_SQL_TEMPLATE.format(threshold=threshold)
    return f"""
WITH RECURSIVE pairs AS (
    SELECT doc_id_1, doc_id_2 FROM ({pairs}) jp
),
edges AS (
    SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
    UNION ALL
    SELECT doc_id_2, doc_id_1 FROM pairs
),
verts AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
reach AS (
    SELECT doc_id, doc_id AS label FROM verts
    UNION
    SELECT e.src AS doc_id, r.label
    FROM reach r JOIN edges e ON e.dst = r.doc_id
),
cc AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cc
"""
