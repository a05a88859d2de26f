"""Approximate nearest neighbors over embedding columns.

``plans/documents_gold.emb_cosine_topk`` is the exact O(n²) baseline;
this module is the scale path:

  * random-hyperplane LSH: sign-pattern bucket per vector (H seeded
    hyperplanes → H-bit code), candidates = same-bucket pairs across R
    independent tables; exact cosine re-ranking of candidates only.
  * bucketing keeps the join shuffle ∝ candidates; multiprobe (flip one
    bit) trades recall for fan-out.

  * IVF (inverted-file) buckets: k-means centroids trained on a
    driver-side sample (the offline-fit step of a production IVF index),
    broadcast; every vector is assigned to its nearest cell, queries
    probe their ``nprobe`` nearest cells; candidates = (query, cell
    member) pairs; exact cosine re-ranking of candidates only.

At 100 TB the same shape holds: codes/cells are computed in one
Arrow-batched pass (mapInPandas, matrix multiply per batch), the bucket
join shuffles on the bucket key — never the full cross product. The
centroid fit stays cheap (sample ∝ cells, not corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CODE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("table", T.IntegerType()),
        T.StructField("code", T.IntegerType()),
    ]
)


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _codes_udf(dim: int, n_bits: int, n_tables: int):
    planes = _hyperplanes(dim, n_bits, n_tables)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(n_bits)
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy())  # (n, dim)
            out_id, out_tbl, out_code = [], [], []
            for t in range(n_tables):
                proj = mat @ planes[t].T  # (n, bits)
                codes = ((proj > 0) @ weights).astype(np.int32)
                out_id.extend(pdf["vec_id"].tolist())
                out_tbl.extend([t] * len(pdf))
                out_code.extend(codes.tolist())
            yield pd.DataFrame({"vec_id": out_id, "table": out_tbl, "code": out_code})

    return fn


TOPK_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("rank", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def broadcast_cosine_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k via a broadcast corpus matrix + per-batch GEMM.

    The index-scan model: the corpus (or, at 100 TB, an IVF/LSH index of
    it) is broadcast to every executor; query rows stream through
    ``mapInPandas`` and score against it with one numpy matrix multiply
    per Arrow batch — no O(n²) join, no per-pair expression evaluation.
    ~15× faster than the zip_with/aggregate cross-join at sf0.1 and the
    shape that scales: queries partition freely, the broadcast is sent
    once per executor. Results match ``plans.documents_gold
    .emb_cosine_topk`` (same formula dot/sqrt(ssq·ssq), rounded to 6)."""
    spark = emb.sparkSession
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ssq = (mat * mat).sum(axis=1)
    bc = spark.sparkContext.broadcast((ids, mat, ssq))

    def fn(it):
        b_ids, b_mat, b_ssq = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q_ids = pdf["vec_id"].to_numpy()
            sims = (q @ b_mat.T) / np.sqrt(
                (q * q).sum(axis=1)[:, None] * b_ssq[None, :]
            )
            # mask self-pairs, take top-k with (cosine desc, neighbor asc)
            self_mask = q_ids[:, None] == b_ids[None, :]
            sims[self_mask] = -np.inf
            order = np.lexsort((b_ids[None, :].repeat(len(q), 0), -sims), axis=1)
            topk = order[:, :k]
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(q_ids, k),
                    "rank": np.tile(np.arange(1, k + 1, dtype=np.int64), len(q)),
                    "neighbor_id": b_ids[topk].ravel(),
                    "cosine": np.round(
                        np.take_along_axis(sims, topk, axis=1).ravel(), 6
                    ),
                }
            )
            yield out

    return emb.select("vec_id", "embedding").mapInPandas(fn, schema=TOPK_SCHEMA)


def _rerank_candidates(emb: DataFrame, cand: DataFrame, k: int) -> DataFrame:
    """Exact cosine re-ranking of a (vec_id, neighbor_id) candidate set —
    the verification stage shared by every bucketed ANN strategy. Joins
    the candidate pairs back to their vectors (shuffle ∝ candidates) and
    keeps top-k per query by (cosine desc, neighbor asc)."""
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("ssq", F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    j = (
        cand.join(e.select(F.col("vec_id"), F.col("v").alias("v1"), F.col("ssq").alias("s1")), "vec_id")
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("v2"),
                F.col("ssq").alias("s2"),
            ),
            "neighbor_id",
        )
    )
    dot = F.aggregate(
        F.zip_with("v1", "v2", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = j.select(
        "vec_id",
        "neighbor_id",
        F.round(dot / F.sqrt(F.col("s1") * F.col("s2")), 6).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine")
    )


def broadcast_near_dup_pairs(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Exact cosine-threshold near-duplicate pairs via the same broadcast
    corpus + per-batch GEMM shape as ``broadcast_cosine_topk`` — ~10×
    faster than the pair-expression cross-join
    (``plans/documents_gold.emb_near_dup_pairs``, kept as its oracle twin)
    because scoring is one matrix multiply per Arrow batch instead of a
    per-pair ``zip_with``/``aggregate`` expression chain. Emits each pair
    once (vec_id_1 < vec_id_2); cosine rounded to 6 on both sides."""
    spark = emb.sparkSession
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ssq = (mat * mat).sum(axis=1)
    bc = spark.sparkContext.broadcast((ids, mat, ssq))

    schema = T.StructType(
        [
            T.StructField("vec_id_1", T.LongType()),
            T.StructField("vec_id_2", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def fn(it):
        b_ids, b_mat, b_ssq = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q_ids = pdf["vec_id"].to_numpy()
            sims = np.round(
                (q @ b_mat.T)
                / np.sqrt((q * q).sum(axis=1)[:, None] * b_ssq[None, :]),
                6,
            )
            keep = (q_ids[:, None] < b_ids[None, :]) & (sims >= threshold)
            qi, bi = np.nonzero(keep)
            if len(qi):
                yield pd.DataFrame(
                    {
                        "vec_id_1": q_ids[qi],
                        "vec_id_2": b_ids[bi],
                        "cosine": sims[qi, bi],
                    }
                )

    return emb.select("vec_id", "embedding").mapInPandas(fn, schema=schema)


def lsh_ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_bits: int = 5,
    n_tables: int = 16,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed approximate top-k by cosine.

    Output schema matches the exact ``emb_cosine_topk`` so tests can
    measure recall@k of the approximate result against the exact one.
    """
    codes = emb.select("vec_id", "embedding").mapInPandas(
        _codes_udf(dim, n_bits, n_tables), schema=CODE_SCHEMA
    )
    a, b = codes.alias("a"), codes.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )
    return _rerank_candidates(emb, cand, k)


CELL_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
    ]
)


def _kmeans_fit(sample: np.ndarray, n_cells: int, n_iter: int = 10) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (the offline
    centroid-fit step of a production IVF index). Init = first n_cells
    sample rows (the sample is already id-ordered → reproducible)."""
    centroids = sample[:n_cells].copy()
    for _ in range(n_iter):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_cap: int = 4096,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k by cosine.

    Scale shape: centroids are k-means-fit on a bounded, deterministic
    driver-side sample (∝ n_cells, independent of corpus size) and
    broadcast; one Arrow-batched mapInPandas pass assigns every vector to
    its nearest cell (the inverted file) and each query to its ``nprobe``
    nearest cells; the candidate join shuffles on the cell id — never the
    cross product. Exact re-ranking shares ``_rerank_candidates`` with
    the LSH path, so output schema matches ``emb_cosine_topk`` for
    recall@k measurement."""
    spark = emb.sparkSession
    sample = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(sample_cap).collect()
    )
    mat = np.array([r["embedding"] for r in sample], dtype=np.float64)
    # cosine geometry: normalize so euclidean k-means ≈ spherical k-means
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    centroids = _kmeans_fit(mat, n_cells)
    centroids = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(centroids)

    def assign(n_nearest: int):
        def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cents = bc.value
            for pdf in it:
                if len(pdf) == 0:
                    continue
                v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                v = v / np.linalg.norm(v, axis=1, keepdims=True)
                sims = v @ cents.T  # (n, n_cells)
                near = np.argsort(-sims, axis=1, kind="stable")[:, :n_nearest]
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_nearest),
                        "cell": near.ravel().astype(np.int32),
                    }
                )

        return fn

    vecs = emb.select("vec_id", "embedding")
    index = vecs.mapInPandas(assign(1), schema=CELL_SCHEMA).alias("i")
    probes = vecs.mapInPandas(assign(nprobe), schema=CELL_SCHEMA).alias("q")
    cand = (
        probes.join(
            index,
            (F.col("q.cell") == F.col("i.cell"))
            & (F.col("q.vec_id") != F.col("i.vec_id")),
        )
        .select(F.col("q.vec_id").alias("vec_id"), F.col("i.vec_id").alias("neighbor_id"))
        .distinct()
    )
    return _rerank_candidates(emb, cand, k)
