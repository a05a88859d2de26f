"""Distributed Lloyd's k-means — the full-corpus upgrade of the bounded
driver-sample centroid fit (``ann._kmeans_fit``).

The IVF index, SemDeDup and PQ all fit their coarse centroids on a
deterministic ≤4096-row sample, which is the right offline shape when
cells only need to be *roughly* balanced. When the centroids themselves
are the product (corpus partitioning for curriculum/mixture design,
cluster-level dedup audits, IVF fits whose sample would miss rare
modes at 10^9+ vectors), the fit must see every row — this module runs
the SAME algorithm (same init, same GEMM argmin, same empty-cell rule,
so the driver-sample fit is literally its oracle on small data) with
per-iteration work distributed:

  * **assignment + map-side combine in one Arrow pass**: each batch
    computes its argmin via the ``|c|² − 2·x·c`` GEMM expansion (the
    form measured 60× over the broadcast-subtract tensor,
    ``ann._kmeans_fit``) and immediately reduces to ≤ k ``(cluster,
    count, vector-sum)`` partial rows — the combiner the naive
    explode→groupBy(cluster) formulation of k-means is missing;
  * **tiny shuffle**: ≤ batches × k partial rows reach a k-group
    ``applyInPandas`` reduce — never a row per input vector;
  * **bounded driver traffic**: exactly k × dim floats cross the
    driver per iteration (the new centroids), independent of corpus
    size; the input is re-scanned ``n_iter`` times (Lloyd's is
    scan-bound — persist the input when it fits cluster memory, the
    caller's choice).

Determinism: init = the k lowest-``vec_id`` vectors (id order, no RNG);
argmin ties break to the lowest cluster index (numpy argmin rule, both
venues); an empty cluster keeps its previous centroid. Floats are
summation-order sensitive (partials add in shuffle order), so parity
with the numpy reference is tolerance-checked — assignments are exact
wherever margins exceed ulp noise (pinned on the clustered fixture).

Reference parity: the reference has no iterative algorithm at all; this
is part of the training-data surface (SURVEY §2.9 / the north star's
curation family), feeding the same cell-partitioned operators as the
sampled fit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("cluster", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("vsum", T.ArrayType(T.DoubleType())),
    ]
)

ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cluster", T.IntegerType()),
    ]
)


def _batch_matrix(pdf: pd.DataFrame, normalize: bool) -> np.ndarray:
    v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    if normalize:
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
    return v


def _argmin_cluster(v: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # ||x−c||² = ||x||² − 2·x·c + ||c||²: drop the c-independent term
    d2 = (cents * cents).sum(axis=1)[None, :] - 2.0 * (v @ cents.T)
    return d2.argmin(axis=1)


def kmeans_fit(
    emb: DataFrame,
    k: int,
    n_iter: int = 10,
    normalize: bool = True,
) -> np.ndarray:
    """Fit k centroids over the FULL corpus; returns a (k, dim) float64
    array. Same semantics as ``ann._kmeans_fit`` run on the whole
    (optionally L2-normalized) matrix: init = k lowest-vec_id rows,
    ``n_iter`` assignment/update rounds, empty clusters frozen."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    init_rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init_rows)}")
    cents = np.array([r["embedding"] for r in init_rows], dtype=np.float64)
    if normalize:
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    sc = emb.sparkSession.sparkContext
    src = emb.select("embedding")

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cluster": [np.int32(pdf["cluster"].iloc[0])],
                "cnt": [np.int64(pdf["cnt"].sum())],
                "vsum": [np.stack(pdf["vsum"].to_numpy()).sum(axis=0)],
            }
        )

    for _ in range(n_iter):
        bc = sc.broadcast(cents)

        def _partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = bc.value
            for pdf in it:
                if len(pdf) == 0:
                    continue
                v = _batch_matrix(pdf, normalize)
                a = _argmin_cluster(v, c)
                order = np.argsort(a, kind="stable")
                a_s, v_s = a[order], v[order]
                starts = np.flatnonzero(
                    np.r_[True, a_s[1:] != a_s[:-1]]
                )
                sums = np.add.reduceat(v_s, starts, axis=0)
                cnts = np.diff(np.r_[starts, len(a_s)])
                yield pd.DataFrame(
                    {
                        "cluster": a_s[starts].astype(np.int32),
                        "cnt": cnts.astype(np.int64),
                        "vsum": list(sums),
                    }
                )

        reduced = (
            src.mapInPandas(_partials, schema=PARTIAL_SCHEMA)
            .groupBy("cluster")
            .applyInPandas(_reduce, schema=PARTIAL_SCHEMA)
            .collect()  # ≤ k rows
        )
        new = cents.copy()
        for r in reduced:
            if r["cnt"] > 0:
                new[r["cluster"]] = np.asarray(r["vsum"]) / r["cnt"]
        cents = new
        bc.unpersist()
    return cents


def kmeans_assign(
    emb: DataFrame, centroids: np.ndarray, normalize: bool = True
) -> DataFrame:
    """(vec_id, cluster) — one map-only Arrow pass, broadcast centroids,
    argmin ties to the lowest cluster index."""
    bc = emb.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64)
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            v = _batch_matrix(pdf, normalize)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster": _argmin_cluster(v, c).astype(np.int32),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        fn, schema=ASSIGN_SCHEMA
    )
