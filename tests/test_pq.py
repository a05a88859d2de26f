"""Product-quantization ANN (`operators/pq.py`): losslessness on a
codebook-realizable corpus, recall + exact-score contracts on the
clustered fixture, and the compression invariant.

PQ is approximate in RECALL only — every returned score is an exact
true-vector cosine (the refine stage) — so like the other approximate
operators (heavy hitters, GK, HLL) it is pytest-venue: recall is pinned
against the exact block-GEMM top-k rather than a DuckDB value hash.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from crypto_near_real_time_data_ingestion_spark.datagen import (
    ensure_clustered_embeddings,
)
from crypto_near_real_time_data_ingestion_spark.operators import ann, pq

DIM, M, KSUB = 64, 8, 16
EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _atom_corpus(n: int = 400, seed: int = 11):
    """A corpus whose every subvector is one of KSUB unit-norm atoms per
    subspace. All vectors then share norm √M, so L2-normalization scales
    every subvector identically and the discrete structure survives —
    which makes a KSUB-codeword PQ encoding LOSSLESS (each atom is a
    centroid: the first KSUB rows enumerate the atoms, seeding k-means
    init exactly on them, and means of identical members are fixed
    points). Lossless encoding ⇒ ADC = exact dot ⇒ PQ top-k must equal
    the brute-force top-k bit for bit."""
    rng = np.random.default_rng(seed)
    dsub = DIM // M
    atoms = rng.standard_normal((M, KSUB, dsub))
    atoms /= np.linalg.norm(atoms, axis=2, keepdims=True)
    choice = rng.integers(0, KSUB, size=(n, M))
    choice[:KSUB] = np.arange(KSUB)[:, None]  # rows 0..KSUB-1 enumerate atoms
    vecs = np.concatenate(
        [atoms[i][choice[:, i]] for i in range(M)], axis=1
    ).astype(np.float32)
    return [(int(i), vecs[i].tolist()) for i in range(n)]


def _pdf_sorted(df):
    return df.toPandas().sort_values(["vec_id", "rank"]).reset_index(drop=True)


def test_pq_exact_on_codebook_realizable_corpus(spark):
    emb = spark.createDataFrame(_atom_corpus(), schema=EMB_SCHEMA)
    got = _pdf_sorted(pq.pq_ann_topk(emb, m=M, ksub=KSUB, dim=DIM))
    want = _pdf_sorted(ann.broadcast_cosine_topk(emb))
    assert got.equals(want)


def test_pq_recall_and_exact_scores_on_clustered(spark):
    """On the Gaussian-mixture fixture PQ is lossy (noise below codeword
    resolution scrambles in-cluster order), so recall@5 is banded, and
    every RETURNED score must still be the exact round6 cosine of its
    pair — the refine-stage contract that separates 'approximate recall'
    from 'approximate answers'."""
    emb = spark.read.parquet(ensure_clustered_embeddings(0.001)).select(
        "vec_id", "embedding"
    )
    got = pq.pq_ann_topk(emb, k=5).toPandas()
    want = ann.broadcast_cosine_topk(emb, k=5).toPandas()
    got_pairs = set(zip(got.vec_id, got.neighbor_id))
    want_pairs = set(zip(want.vec_id, want.neighbor_id))
    recall = len(got_pairs & want_pairs) / len(want_pairs)
    # deterministic end to end (seeded fixture, id-ordered fit sample):
    # the default refine=4 shortlist recovers EVERY true neighbor that
    # raw ADC order misses (refine=1 measures 0.33 on this fixture)
    assert recall == 1.0, recall

    # exact-score contract: recompute each returned pair's cosine from
    # the raw vectors; the refine stage must have produced exactly it
    raw = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    for row in got.itertuples():
        a, b = raw[row.vec_id], raw[row.neighbor_id]
        cos = float(a @ b / np.sqrt((a @ a) * (b @ b)))
        cos = float(np.sign(cos) * np.floor(abs(cos) * 1e6 + 0.5) / 1e6)
        assert row.cosine == cos, (row, cos)


def test_pq_encode_compression_invariants(spark):
    emb = spark.read.parquet(ensure_clustered_embeddings(0.001)).select(
        "vec_id", "embedding"
    )
    cbs = pq.pq_fit(emb)
    assert cbs.shape == (8, 256, 8)
    codes = pq.pq_encode(emb, cbs).toPandas()
    assert len(codes) == emb.count()
    mat = np.stack(codes["codes"].to_numpy())
    assert mat.shape[1] == 8  # 8 int16 code slots vs 64 floats raw
    assert mat.min() >= 0 and mat.max() < 256
    # deterministic fit: same sample, same init, same codebooks
    assert np.array_equal(cbs, pq.pq_fit(emb))


def test_pq_refine_widens_recall(spark):
    """A wider ADC shortlist can only add true neighbors (monotone in
    ``refine``) — the knob a 100 TB operator actually tunes."""
    emb = spark.read.parquet(ensure_clustered_embeddings(0.001)).select(
        "vec_id", "embedding"
    )
    want = ann.broadcast_cosine_topk(emb, k=5).toPandas()
    want_pairs = set(zip(want.vec_id, want.neighbor_id))

    def recall(refine):
        got = pq.pq_ann_topk(emb, k=5, refine=refine).toPandas()
        return len(set(zip(got.vec_id, got.neighbor_id)) & want_pairs) / len(
            want_pairs
        )

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    # measured on this fixture: 0.3334 → 1.0 — ADC alone scrambles
    # in-cluster order (noise sits below codeword resolution); the
    # shortlist factor is what buys the recall back
    assert r1 < 1.0 and r8 == 1.0, (r1, r8)


def test_pq_encode_as_stream(spark, tmp_path):
    """Index ingest is a map-only STREAM: ``pq_encode`` applied to a
    file stream (new vectors arriving) writes bit-identical codes to the
    batch encode — the index-maintenance path at 100 TB is the same
    deterministic Arrow pass, just behind readStream (no state, no
    watermark, nothing to re-derive on restart beyond the checkpoint)."""
    import os

    path = ensure_clustered_embeddings(0.001)
    src_dir = os.path.dirname(path)
    schema = spark.read.parquet(path).schema
    batch_emb = spark.read.parquet(path).select("vec_id", "embedding")
    cbs = pq.pq_fit(batch_emb)
    stream_emb = (
        spark.readStream.schema(schema).parquet(src_dir).select("vec_id", "embedding")
    )
    out, ckpt = str(tmp_path / "codes"), str(tmp_path / "ckpt")
    q = (
        pq.pq_encode(stream_emb, cbs)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = (
        pq.pq_encode(batch_emb, cbs)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(got["vec_id"]) == list(want["vec_id"])
    assert all(
        list(a) == list(b) for a, b in zip(got["codes"], want["codes"])
    )


def test_ivfpq_recall_and_exact_scores(spark):
    """The composed IVF-PQ index (coarse cells prune WHICH members are
    scored, codes prune WHAT ships) still recovers full recall on the
    clustered fixture at the graded geometry (64 cells / nprobe 1 /
    refine 4 — one natural cluster per cell, like `ivf_ann_topk`'s
    graded config), and every returned score is the exact round6 cosine
    (shared refine contract)."""
    emb = spark.read.parquet(ensure_clustered_embeddings(0.001)).select(
        "vec_id", "embedding"
    )
    got = pq.ivfpq_ann_topk(emb, k=5).toPandas()
    want = ann.broadcast_cosine_topk(emb, k=5).toPandas()
    want_pairs = set(zip(want.vec_id, want.neighbor_id))
    recall = len(set(zip(got.vec_id, got.neighbor_id)) & want_pairs) / len(
        want_pairs
    )
    assert recall == 1.0, recall  # deterministic end to end

    raw = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    for row in got.itertuples():
        a, b = raw[row.vec_id], raw[row.neighbor_id]
        cos = float(a @ b / np.sqrt((a @ a) * (b @ b)))
        cos = float(np.sign(cos) * np.floor(abs(cos) * 1e6 + 0.5) / 1e6)
        assert row.cosine == cos, (row, cos)


def test_ivfpq_recall_curve_on_wide_fixture(spark):
    """The compression↔recall trade is the operator's actual contract,
    so pin the measured curve where it is non-trivial: the wide-noise
    fixture (in-cluster cosine gaps O(0.01) — the realistic embedding
    regime; the default fixture's 1e-5 gaps are below ANY 8-byte code's
    resolution) at sf0.1: 5000 vectors, cluster size ~78 ≫ the refine=4
    shortlist of 20, so nothing is recovered by coverage alone.
    Measured (deterministic, seeded): m=8 → 0.59, m=32 → 0.998,
    m=32+refine16 → 1.0."""
    emb = spark.read.parquet(
        ensure_clustered_embeddings(0.1, noise_scale=3.0)
    ).select("vec_id", "embedding")
    want = ann.broadcast_cosine_topk(emb, k=5).toPandas()
    want_pairs = set(zip(want.vec_id, want.neighbor_id))

    def recall(m, refine):
        got = pq.ivfpq_ann_topk(emb, k=5, m=m, refine=refine).toPandas()
        return len(set(zip(got.vec_id, got.neighbor_id)) & want_pairs) / len(
            want_pairs
        )

    r8 = recall(8, 4)
    r32 = recall(32, 4)
    r32_wide = recall(32, 16)
    assert r8 < r32, (r8, r32)  # more code bytes → better ranking
    assert r32 >= 0.99, r32
    assert r32_wide == 1.0, r32_wide


def test_ivfpq_sub_blocks_identical(spark):
    """Hash-splitting cells into bounded sub-tiles (the giant-cell
    memory knob) must not change a row: per-tile shortlists merge under
    the same total order regardless of how a cell's members and probing
    queries are split."""
    emb = spark.read.parquet(ensure_clustered_embeddings(0.001)).select(
        "vec_id", "embedding"
    )
    whole = _pdf_sorted(pq.ivfpq_ann_topk(emb, k=5))
    split = _pdf_sorted(pq.ivfpq_ann_topk(emb, k=5, sub_blocks=3))
    assert split.equals(whole)


def test_ivfpq_output_contract(spark):
    """Output schema/shape contract: k rows per query, ranks 1..k, the
    family's TOPK schema — interchangeable with every other ANN path."""
    emb = spark.read.parquet(ensure_clustered_embeddings(0.001)).select(
        "vec_id", "embedding"
    )
    got = pq.ivfpq_ann_topk(emb, k=3).toPandas()
    n = emb.count()
    assert list(got.columns) == ["vec_id", "rank", "neighbor_id", "cosine"]
    assert len(got) == 3 * n
    per = got.groupby("vec_id")["rank"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all() and (per["max"] == 3).all()
    assert (per["count"] == 3).all()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
