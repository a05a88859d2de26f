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
nested plan (the classic iterative-algorithm trap on Spark).

Adversarial chains (diameter > max_iter — plausible at 100 TB edge
counts) no longer raise: ``connected_components`` falls back to the
large-star/small-star alternation of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SoCC'14), which contracts the
graph toward per-component stars in O(log² n) rounds regardless of
diameter — each round is still just groupBy-min + join (shuffle ∝
edges), so the fallback keeps the exact scale shape of the fast path.
The fallback runs on the label-contracted QUOTIENT graph, so the
exhausted min-label rounds are not wasted: only the residual graph
(edges whose endpoints still disagree) is re-closed.

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
        # diameter > max_iter: a silent exit would return WRONG labels
        # for any component whose min-label eccentricity exceeds the
        # round budget. Instead of raising (round-3 behavior), switch to
        # the diameter-independent star algorithm — but on the QUOTIENT
        # graph, not the raw edges: the finished rounds already agreed
        # on labels for almost the whole graph, so contract each partial
        # cluster to its label and close only the (typically tiny)
        # residual. Quotient components map 1:1 to input components, and
        # a component's global min id is itself a label (nothing smaller
        # is reachable from the min vertex, so label(min) = min) —
        # composing through the partial labels preserves exact ids.
        lab_s = labels.select(F.col("v").alias("src"), F.col("label").alias("qs"))
        lab_d = labels.select(F.col("v").alias("dst"), F.col("label").alias("qd"))
        q_edges = (
            sym.join(lab_s, "src")
            .join(lab_d, "dst")
            .select(F.col("qs").alias("e1"), F.col("qd").alias("e2"))
            .filter(F.col("e1") != F.col("e2"))
            # no .distinct() here: _star_components canonicalizes and
            # dedups the edge set itself — a caller-side pass would be
            # one wasted shuffle of the residual graph
        )
        q_vertices = labels.select(F.col("label").alias("q")).distinct()
        stars = _star_components(q_vertices, q_edges, "q", "e1", "e2")
        return labels.join(
            stars.withColumnRenamed("q", "label"), "label"
        ).select(F.col("v").alias(vertex_col), "cluster_id")

    return labels.select(
        F.col("v").alias(vertex_col), F.col("label").alias("cluster_id")
    )


def _star_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str,
    src_col: str,
    dst_col: str,
    max_iter: int = 60,
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., SoCC'14): each
    round re-points every vertex's larger neighbors (large-star) and then
    its smaller neighborhood (small-star) at the local minimum, so every
    component contracts to a star rooted at its min id in O(log² n)
    rounds — INDEPENDENT of component diameter, unlike min-label
    propagation. Per round: two groupBy-mins and two joins, shuffle ∝
    edges; ``distinct()`` keeps the edge set canonical so convergence is
    a plain set-stability check. 60 rounds covers n < 2^~60 at the
    proven bound — exhausting it still fails loudly."""
    e = (
        edges.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        if e.isEmpty():
            break
        # large-star: u's neighbors BIGGER than u re-point at
        # m = min(Γ(u) ∪ {u}); star edges stay oriented (big, small)
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: u and its (all smaller) neighbors re-point at the
        # neighborhood min
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        e_new = (
            ls.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
            .localCheckpoint()  # truncate lineage each round
        )
        stable = (
            e_new.count() == e.count() and e_new.subtract(e).isEmpty()
        )
        e = e_new
        if stable:
            break
    else:
        raise RuntimeError(
            f"_star_components did not converge in {max_iter} rounds — "
            "edge set still changing (should be impossible below 2^60 "
            "vertices; check for non-deterministic ids)"
        )
    # converged star form: every non-root vertex carries exactly one edge
    # (v, component_min); roots and singletons label themselves
    return (
        vertices.select(F.col(vertex_col).alias("v"))
        .join(e.select(F.col("u").alias("v"), F.col("v").alias("label")), "v", "left")
        .select(
            F.col("v").alias(vertex_col),
            F.coalesce("label", F.col("v")).alias("cluster_id"),
        )
    )


def _with_cluster_sizes(cc: DataFrame, vertex_col: str) -> DataFrame:
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(vertex_col, "cluster_id", "cluster_size")


def doc_dup_clusters(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-dup clusters over the MinHash-LSH verified pair graph (the
    scale path — candidates via band buckets, exact-Jaccard verified,
    then closed into components). Output: (doc_id, cluster_id,
    cluster_size); singleton docs form their own cluster."""
    from .text_dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, threshold).select("doc_id_1", "doc_id_2")
    vertices = docs.filter(F.col("text").isNotNull()).select("doc_id")
    return _with_cluster_sizes(connected_components(vertices, pairs), "doc_id")


def simhash_dup_clusters(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup clusters over the SimHash pigeonhole pair graph — the
    bit-signature sibling of ``doc_dup_clusters``. Same closure, pairs
    from the 4-block hamming-≤ k join (shuffle ∝ block buckets, no
    all-pairs work). Output: (doc_id, cluster_id, cluster_size)."""
    from .text_dedup import simhash_pairs

    pairs = simhash_pairs(docs, max_hamming).select("doc_id_1", "doc_id_2")
    vertices = docs.filter(F.col("text").isNotNull()).select("doc_id")
    return _with_cluster_sizes(connected_components(vertices, pairs), "doc_id")


def emb_dup_clusters(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """SEMANTIC dedup closure: connected components over the
    embedding-cosine near-duplicate pair graph — the embedding-space
    sibling of ``doc_dup_clusters`` (text/MinHash space). Cluster-form
    status across the dedup family: exact dedup groups by content hash
    (its groups ARE the clusters), MinHash-LSH / SimHash /
    embedding-cosine each have an explicit closure op here, and the
    n-gram-Jaccard closure coincides with ``doc_dup_clusters`` (the LSH
    pairs are Jaccard-verified at pinned recall 1.0).

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
    return _with_cluster_sizes(cc, "vec_id")


# One closure oracle serves every pair generator — parameterized by
# (pairs SQL, its two id columns, the vertex source) exactly as
# connected_components itself is, so a semantics fix cannot diverge the
# per-family oracles.
_CLOSURE_ORACLE_SQL_TEMPLATE = """
WITH RECURSIVE pairs AS (
    SELECT {id1}, {id2} FROM ({pairs_sql}) p
),
edges AS (
    SELECT {id1} AS src, {id2} AS dst FROM pairs
    UNION ALL
    SELECT {id2}, {id1} FROM pairs
),
verts AS ({verts_sql}),
reach AS (
    SELECT {vid}, {vid} AS label FROM verts
    UNION
    SELECT e.src AS {vid}, r.label
    FROM reach r JOIN edges e ON e.dst = r.{vid}
),
cc AS (SELECT {vid}, min(label) AS cluster_id FROM reach GROUP BY {vid})
SELECT {vid}, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cc
"""

_DOC_VERTS_SQL = "SELECT doc_id FROM documents WHERE text IS NOT NULL"


def closure_oracle_sql(pairs_sql: str, vid: str, id1: str, id2: str, verts_sql: str) -> str:
    """DuckDB recursive transitive min-label closure over an arbitrary
    pair SQL — an independent formulation of ``connected_components``."""
    return _CLOSURE_ORACLE_SQL_TEMPLATE.format(
        pairs_sql=pairs_sql, vid=vid, id1=id1, id2=id2, verts_sql=verts_sql
    )


def emb_dup_clusters_oracle_sql(threshold: float = 0.45) -> str:
    """Closure over the exact cosine pairs (the same pair oracle that
    grades ``emb_near_dup``)."""
    from ..plans.documents_gold import EMB_NEAR_DUP_ORACLE_SQL_TEMPLATE

    pairs = EMB_NEAR_DUP_ORACLE_SQL_TEMPLATE.format(threshold=threshold)
    return closure_oracle_sql(
        pairs, "vec_id", "vec_id_1", "vec_id_2", "SELECT vec_id FROM embeddings"
    )


def dup_clusters_oracle_sql(threshold: float = 0.5) -> str:
    """Closure over the EXACT Jaccard pairs (== the verified LSH pairs
    at pinned recall 1.0)."""
    from ..plans.documents_gold import DOC_JACCARD_ORACLE_SQL_TEMPLATE

    pairs = DOC_JACCARD_ORACLE_SQL_TEMPLATE.format(threshold=threshold)
    return closure_oracle_sql(pairs, "doc_id", "doc_id_1", "doc_id_2", _DOC_VERTS_SQL)


def simhash_dup_clusters_oracle_sql(max_hamming: int = 3) -> str:
    """Closure over the DuckDB-re-derived SimHash pairs (the same
    HUGEINT mod-2⁶⁴ re-derivation that grades ``doc_simhash_pairs``)."""
    from .text_dedup import simhash_oracle_sql

    pairs = simhash_oracle_sql(max_hamming)
    return closure_oracle_sql(pairs, "doc_id", "doc_id_1", "doc_id_2", _DOC_VERTS_SQL)
