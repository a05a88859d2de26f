"""Link-graph importance scoring: PageRank over the k-NN similarity graph,
in an exact integer fixed-point regime.

Beyond-reference training-data op (the reference repo has no graph
operator): centrality over the document/embedding similarity graph is
the CommonCrawl-style link-analysis quality signal — score each sample
by how central it is among its nearest neighbors, then use the score
for curation/mixture weighting. The iterative join+aggregate shape is
the same Spark-first pattern as ``operators/clusters.py`` (min-label
connected components): per round, ONE shuffle keyed on the edge source
(join ranks) and ONE keyed on the destination (sum shares); lineage is
truncated per round with an eager ``localCheckpoint`` so the plan does
not grow with iterations. At 100 TB the edge list is the bucketed ANN
output (bounded per-node degree k), so every round's shuffle is
O(k · nodes) — never all-pairs.

Exact regime (the repo's hash-grade pattern, cf. ``streaming_countmin``
/ ``streaming_heavy_hitters``): the classic float PageRank sums
contributions in partition order, which is not bit-reproducible across
engines or partitionings. Here every quantity is 64-bit integer fixed
point at ``SCALE`` = 10^12:

    r_0(v)     = SCALE div N
    share_i(u) = (85 · r_i(u)) div (100 · outdeg(u))   per edge u→v
    r_{i+1}(v) = (15 · SCALE) div (100 · N) + Σ_{u→v} share_i(u)

Integer addition is associative-commutative, each per-edge share is
computed BEFORE aggregation, and both engines' integer division agrees
on non-negative operands (Spark ``div`` truncates toward zero, DuckDB
``//`` floors — identical for ≥ 0). Results are therefore bit-identical
regardless of partitioning, join order, or engine — a plain-SQL oracle
value-hash grades the whole iterative computation. Max intermediate is
85 · SCALE < 2^63; total mass only shrinks under floor-division, so no
overflow at any N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
N_ITER = 5
KNN_K = 5


BROADCAST_NODES_MAX = 1_000_000  # rank rows are 16 B — ~16 MB broadcast


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = N_ITER,
    scale: int = SCALE,
    seeds: DataFrame | None = None,
    broadcast_nodes_max: int = BROADCAST_NODES_MAX,
) -> DataFrame:
    """Integer fixed-point PageRank (see module doc).

    ``nodes``: one column ``node``; ``edges``: ``src``, ``dst``
    (directed, duplicates allowed — each occurrence carries a share).
    Returns (node, pr) with pr the fixed-point rank at ``scale``.

    ``seeds`` (one column ``node``, a subset of nodes) switches the
    teleport to the personalized/TrustRank form: restart mass lands
    ONLY on seeds (split evenly, integer floor), and r₀ is uniform over
    seeds instead of all nodes — trust propagates outward from a vetted
    set through the link structure, the Gyöngyi et al. TrustRank recipe
    a curation pipeline uses to score documents by proximity to a
    hand-vetted seed corpus. Same exact-regime guarantees.

    Join strategy: the rank table is node-sized, so below
    ``broadcast_nodes_max`` (default ``BROADCAST_NODES_MAX``) it (and
    the per-round share sums) broadcast — ONE shuffle per round (the
    dst partial-sum), the big fan table never moves. Past that, the
    hints drop away and both joins shuffle on their keys — the
    10^9-node web-graph shape. Results are identical either way
    (integer arithmetic is order-invariant; pinned bit-equal by
    ``test_pagerank.py::test_shuffle_branch_bit_equals_broadcast``,
    which forces the threshold to 0)."""
    n = nodes.count()  # driver scalar: a bounded count, not a collect
    if n == 0:
        raise ValueError("pagerank over an empty node set")
    small = n <= broadcast_nodes_max
    maybe_bc = F.broadcast if small else (lambda df: df)
    if seeds is None:
        base = nodes.select(
            "node",
            F.lit((15 * scale) // (100 * n)).cast("long").alias("tele"),
            F.lit(scale // n).cast("long").alias("r0"),
        )
    else:
        n_seed = seeds.count()
        if n_seed == 0:
            raise ValueError("trustrank with an empty seed set")
        is_seed = F.col("__seed").isNotNull()
        base = (
            nodes.join(
                maybe_bc(seeds.select(F.col("node").alias("__seed"))),
                nodes["node"] == F.col("__seed"),
                "left",
            )
            .select(
                "node",
                F.when(is_seed, F.lit((15 * scale) // (100 * n_seed)))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("tele"),
                F.when(is_seed, F.lit(scale // n_seed))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("r0"),
            )
        )
    base = base.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # src → (dst, outdeg): resolved once, reused every round
    fan = edges.join(maybe_bc(deg), "src").localCheckpoint(eager=True)
    ranks = base.select("node", F.col("r0").alias("r")).localCheckpoint(
        eager=True
    )
    for _ in range(n_iter):
        shares = fan.join(maybe_bc(ranks), fan["src"] == ranks["node"]).select(
            F.col("dst"),
            F.expr("(85 * r) div (100 * outdeg)").alias("share"),
        )
        summed = shares.groupBy("dst").agg(F.sum("share").alias("s"))
        nxt = (
            base.join(maybe_bc(summed), base["node"] == summed["dst"], "left")
            .select(
                "node",
                (F.col("tele") + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
        # truncate lineage each round (the clusters.py pattern); the
        # superseded round's checkpoint blocks are unreferenced after
        # rebinding and the ContextCleaner reclaims them
        ranks = nxt.localCheckpoint(eager=True)
    return ranks


def emb_knn_pagerank(
    emb: DataFrame, k: int = KNN_K, n_iter: int = N_ITER
) -> DataFrame:
    """Centrality over the exact cosine k-NN graph of an embedding table
    (vec_id, embedding). The edge list is ``ann.broadcast_cosine_topk``
    (tiled GEMM, exact, deterministic (cosine desc, neighbor asc)
    tiebreak) — at production scale swap in the LSH/IVF ANN variants,
    which answer the same top-k contract on clustered corpora."""
    from . import ann

    edges = ann.broadcast_cosine_topk(emb, k=k).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    pr = pagerank_fixed_point(nodes, edges, n_iter=n_iter)
    return pr.select(F.col("node").alias("vec_id"), F.col("r").alias("pr"))


def emb_knn_trustrank(
    emb: DataFrame,
    seed_max_id: int,
    k: int = KNN_K,
    n_iter: int = N_ITER,
) -> DataFrame:
    """TrustRank over the exact cosine k-NN graph: restart mass lands
    only on the vetted seed set (here the deterministic ``vec_id <
    seed_max_id`` slice — in production, the hand-curated corpus). The
    score is the integer fixed-point trust mass reaching each document
    through similarity links — the curation signal for "how close is
    this sample to the vetted set", with the same chained-CTE oracle
    shape as the uniform PageRank."""
    from . import ann

    edges = ann.broadcast_cosine_topk(emb, k=k).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    seeds = nodes.filter(F.col("node") < seed_max_id)
    pr = pagerank_fixed_point(nodes, edges, n_iter=n_iter, seeds=seeds)
    return pr.select(F.col("node").alias("vec_id"), F.col("r").alias("trust"))


def emb_knn_trustrank_oracle_sql(
    seed_max_id: int,
    k: int = KNN_K,
    n_iter: int = N_ITER,
    table: str = "embeddings",
    scale: int = SCALE,
) -> str:
    """DuckDB oracle for ``emb_knn_trustrank`` — the PageRank chain with
    the teleport/init terms gated on seed membership."""
    from ..plans.documents_gold import EMB_TOPK_ORACLE_SQL_TEMPLATE

    topk = EMB_TOPK_ORACLE_SQL_TEMPLATE.format(k=k, table=table).strip()
    tele = (
        f"CASE WHEN n.node < {seed_max_id} "
        f"THEN (15 * {scale}) // (100 * (SELECT c FROM ns)) ELSE 0 END"
    )
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(
            f"""it{i} AS (
  SELECT n.node, CAST({tele} + COALESCE(s.total, 0) AS BIGINT) AS r
  FROM (SELECT vec_id AS node FROM {table}) n
  LEFT JOIN (SELECT e.dst AS node,
                    SUM((85 * p.r) // (100 * d.outdeg)) AS total
             FROM edges e
             JOIN it{i - 1} p ON p.node = e.src
             JOIN deg d ON d.src = e.src
             GROUP BY e.dst) s USING (node))"""
        )
    chain = ",\n".join(iters)
    return f"""
WITH topk AS ({topk}),
edges AS (SELECT vec_id AS src, neighbor_id AS dst FROM topk),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
ns AS (SELECT CAST(count(*) AS BIGINT) AS c FROM {table}
       WHERE vec_id < {seed_max_id}),
it0 AS (SELECT vec_id AS node,
               CAST(CASE WHEN vec_id < {seed_max_id}
                    THEN {scale} // (SELECT c FROM ns) ELSE 0 END
                    AS BIGINT) AS r
        FROM {table}),
{chain}
SELECT node AS vec_id, r AS trust FROM it{n_iter}
"""


def emb_knn_pagerank_oracle_sql(
    k: int = KNN_K,
    n_iter: int = N_ITER,
    table: str = "embeddings",
    scale: int = SCALE,
) -> str:
    """DuckDB oracle: the exact brute-force top-k CTE (the SAME template
    the graded ANN entries answer) feeding ``n_iter`` chained
    integer-division iteration CTEs. Chained (not recursive) CTEs —
    standard SQL forbids aggregation in a recursive term, and a pinned
    iteration count is the operator's contract anyway."""
    from ..plans.documents_gold import EMB_TOPK_ORACLE_SQL_TEMPLATE

    topk = EMB_TOPK_ORACLE_SQL_TEMPLATE.format(k=k, table=table).strip()
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(
            f"""it{i} AS (
  SELECT n.node,
         CAST((15 * {scale}) // (100 * (SELECT c FROM nn))
              + COALESCE(s.total, 0) AS BIGINT) AS r
  FROM (SELECT vec_id AS node FROM {table}) n
  LEFT JOIN (SELECT e.dst AS node,
                    SUM((85 * p.r) // (100 * d.outdeg)) AS total
             FROM edges e
             JOIN it{i - 1} p ON p.node = e.src
             JOIN deg d ON d.src = e.src
             GROUP BY e.dst) s USING (node))"""
        )
    chain = ",\n".join(iters)
    return f"""
WITH topk AS ({topk}),
edges AS (SELECT vec_id AS src, neighbor_id AS dst FROM topk),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM {table}),
it0 AS (SELECT vec_id AS node, CAST({scale} // c AS BIGINT) AS r
        FROM {table}, nn),
{chain}
SELECT node AS vec_id, r AS pr FROM it{n_iter}
"""
