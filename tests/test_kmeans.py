"""Distributed Lloyd's k-means (`operators/kmeans.py`): the bounded
driver-sample fit (`ann._kmeans_fit`) run on the FULL corpus is the
oracle — same init, same GEMM argmin, same empty-cell rule — so parity
is checked against it directly (float tolerance for the summation-order
difference; assignments exact on the clear-margin fixture)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from crypto_near_real_time_data_ingestion_spark.datagen import (
    ensure_clustered_embeddings,
)
from crypto_near_real_time_data_ingestion_spark.operators.ann import _kmeans_fit
from crypto_near_real_time_data_ingestion_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_fit,
)

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

K = 8


@pytest.fixture(scope="module")
def clustered(spark):
    # noise_scale=3.0: in-cluster cosine gaps O(1e-3) — margins dwarf
    # the ulp-level float noise between summation orders
    return spark.read.parquet(
        ensure_clustered_embeddings(0.001, noise_scale=3.0)
    ).select("vec_id", "embedding")


def _full_matrix(df):
    rows = df.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


def test_kmeans_matches_driver_fit_on_full_corpus(clustered):
    ids, mat = _full_matrix(clustered)
    want = _kmeans_fit(mat, K)
    got = kmeans_fit(clustered, K)
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12)
    # assignments agree exactly with the reference argmin
    d2 = (want * want).sum(axis=1)[None, :] - 2.0 * (mat @ want.T)
    ref_assign = d2.argmin(axis=1)
    got_assign = (
        kmeans_assign(clustered, got)
        .toPandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    assert (got_assign == ref_assign).all()


def test_kmeans_partition_invariance(clustered):
    a = kmeans_fit(clustered, K, n_iter=4)
    b = kmeans_fit(clustered.repartition(7), K, n_iter=4)
    assert np.allclose(a, b, rtol=1e-9, atol=1e-12)
    pa = kmeans_assign(clustered, a).toPandas().sort_values("vec_id")
    pb = (
        kmeans_assign(clustered.repartition(5), b)
        .toPandas()
        .sort_values("vec_id")
    )
    assert (pa["cluster"].to_numpy() == pb["cluster"].to_numpy()).all()


def test_kmeans_recovers_planted_blobs(spark):
    rng = np.random.default_rng(3)
    centers = np.array(
        [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    )
    pts, labels = [], []
    for c in range(3):
        for i in range(40):
            pts.append(centers[c] + rng.normal(0, 0.05, 3))
            labels.append(c)
    # interleave ids across blobs so init (first k ids) spans all blobs:
    # vec_id i takes blob (i % 3)'s (i // 3)-th point
    perm = [(i % 3) * 40 + i // 3 for i in range(120)]
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[perm[i]]]) for i in range(120)],
        EMB_SCHEMA,
    )
    cents = kmeans_fit(df, 3, n_iter=5, normalize=False)
    assign = kmeans_assign(df, cents, normalize=False).toPandas()
    got_label = {
        int(r["vec_id"]): int(r["cluster"]) for _, r in assign.iterrows()
    }
    # every blob lands in exactly one cluster, and clusters are distinct
    blob_to_cluster = {}
    for i in range(120):
        b = labels[perm[i]]
        blob_to_cluster.setdefault(b, set()).add(got_label[i])
    assert all(len(s) == 1 for s in blob_to_cluster.values())
    assert len({next(iter(s)) for s in blob_to_cluster.values()}) == 3
    for b, s in blob_to_cluster.items():
        c = next(iter(s))
        assert np.allclose(cents[c], centers[b], atol=0.05)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # init = first 2 ids = two identical [1,0] vectors; every point
    # arg-mins to cluster 0 (ties -> lowest index), so cluster 1 never
    # receives members and must keep its init centroid — the same
    # frozen-cell rule as ann._kmeans_fit
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.0, 1.0]),
        ],
        EMB_SCHEMA,
    )
    cents = kmeans_fit(df, 2, n_iter=1, normalize=False)
    assert np.allclose(cents[1], [1.0, 0.0])
    assert np.allclose(cents[0], [0.5, 0.5])
    # the reference implementation agrees on the same corpus
    from crypto_near_real_time_data_ingestion_spark.operators.ann import (
        _kmeans_fit,
    )

    mat = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    assert np.allclose(_kmeans_fit(mat, 2, n_iter=1), cents)


def test_kmeans_k_exceeds_corpus_raises(spark):
    df = spark.createDataFrame([(0, [1.0, 0.0])], EMB_SCHEMA)
    with pytest.raises(ValueError, match="exceeds corpus size"):
        kmeans_fit(df, 5)
