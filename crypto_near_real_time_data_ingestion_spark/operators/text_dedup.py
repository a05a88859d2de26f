"""Approximate near-duplicate detection: MinHash+LSH, SimHash, winnowing.

The scale path for text dedup at 100 TB (the exact Jaccard plan in
``plans/documents_gold.py`` is its O(n²) ground truth, used by tests to
measure recall):

  MinHash+LSH   word-shingle → 64 minhash perms → 16 bands × 4 rows →
                band-bucket self-join → candidate pairs → (optional)
                exact-Jaccard verification of candidates only.
                Shuffle ∝ candidate pairs, not n².
  SimHash       64-bit signed-projection hash over shingle hashes;
                near-dup iff hamming distance ≤ k. Banded the same way
                (4 blocks of 16 bits → a pair within hamming ≤ 3 shares
                at least one exact block — pigeonhole).
  Winnowing     robust local fingerprints (min hash in each sliding
                window of k-gram hashes) — document fingerprinting for
                containment/overlap detection.

All hashing is deterministic splitmix64-style integer mixing over
xxhash-free custom shingle hashes — reproducible across runs/machines,
no Python ``hash()``. Computation is numpy-vectorized inside pandas UDFs
(Arrow batches; no per-row Python in the shuffle path).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import WORD_RE

_MERSENNE = np.uint64((1 << 61) - 1)
N_PERMS = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERMS // N_BANDS


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        return z ^ (z >> np.uint64(31))


def _shingle_hashes(shingles: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash per shingle: first 8 bytes of md5 (C-speed
    via hashlib — no per-byte Python), splitmix64-finalized. Stable across
    runs/machines (unlike Python's seeded ``hash()``)."""
    import hashlib as _hl

    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(_hl.md5(s.encode("utf-8")).digest()[:8], "little")
    return _splitmix64(out)


# fixed per-permutation affine coefficients (seeded, deterministic)
_rng = np.random.default_rng(20250101)
_A = _rng.integers(1, (1 << 61) - 1, size=N_PERMS, dtype=np.uint64) | np.uint64(1)
_B = _rng.integers(0, (1 << 61) - 1, size=N_PERMS, dtype=np.uint64)


def _minhash_sig(hashes: np.ndarray) -> np.ndarray:
    """64 minhash values via affine permutations mod Mersenne prime."""
    if len(hashes) == 0:
        return np.full(N_PERMS, np.iinfo(np.int64).max, dtype=np.int64)
    h = hashes % _MERSENNE
    # (perms × shingles) affine transform, min over shingles; uint64
    # wraparound in the product is deliberate extra mixing (minhash only
    # needs a fixed pseudo-permutation, not exact modular arithmetic)
    with np.errstate(over="ignore"):
        vals = (np.outer(_A, h) + _B[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.int64)


MINHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
    ]
)


def _minhash_bands_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows_doc, rows_band, rows_hash = [], [], []
        for doc_id, shingles in zip(pdf["doc_id"], pdf["shingles"]):
            sig = _minhash_sig(_shingle_hashes(list(shingles)))
            for b in range(N_BANDS):
                chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND].astype(
                    np.uint64
                )
                bh = np.uint64(b + 1)
                for v in chunk:
                    bh = _splitmix64(np.uint64(bh) ^ np.uint64(v))
                rows_doc.append(doc_id)
                rows_band.append(b)
                rows_hash.append(np.int64(bh))
        yield pd.DataFrame(
            {"doc_id": rows_doc, "band": rows_band, "band_hash": rows_hash}
        )


def minhash_lsh_candidates(shingled: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.

    Input: ``doc_shingles()`` output (doc_id, shingles). The band table is
    exploded (one row per doc × band), self-joined on (band, band_hash) —
    at scale this is a shuffle on the bucket key, with bucket sizes capped
    by construction (a bucket join blowup means the band hash is too
    coarse → raise ROWS_PER_BAND)."""
    bands = shingled.mapInPandas(_minhash_bands_udf, schema=MINHASH_SCHEMA)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.5, verify: bool = True
) -> DataFrame:
    """MinHash-LSH near-dup pairs; candidates optionally verified with
    exact Jaccard (computed only for candidates — the cheap part)."""
    from ..plans.documents_gold import doc_shingles

    sh = doc_shingles(docs).cache()
    cand = minhash_lsh_candidates(sh)
    if not verify:
        return cand
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("shingles").alias("sh2"))
    joined = cand.join(s1, "doc_id_1").join(s2, "doc_id_2")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (
        joined.select(
            "doc_id_1", "doc_id_2", (inter / union).alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
)


def _simhash_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    bit_idx = np.arange(64, dtype=np.uint64)
    for pdf in it:
        ids, sigs = [], []
        for doc_id, shingles in zip(pdf["doc_id"], pdf["shingles"]):
            h = _shingle_hashes(list(shingles))
            if len(h) == 0:
                ids.append(doc_id)
                sigs.append(0)
                continue
            bits = (h[:, None] >> bit_idx[None, :]) & np.uint64(1)
            score = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sig = np.uint64(0)
            for j in range(64):
                if score[j] > 0:
                    sig |= np.uint64(1) << np.uint64(j)
            ids.append(doc_id)
            sigs.append(np.int64(sig))
        yield pd.DataFrame({"doc_id": ids, "simhash": sigs})


def simhash_signatures(shingled: DataFrame) -> DataFrame:
    return shingled.mapInPandas(_simhash_udf, schema=SIMHASH_SCHEMA)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ k via 4-block pigeonhole LSH:
    any pair within hamming ≤ 3 agrees exactly on ≥1 of 4 16-bit blocks."""
    from ..plans.documents_gold import doc_shingles

    sig = simhash_signatures(doc_shingles(docs)).cache()
    blocks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.block", "bk.val")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_1", "doc_id_2", "hamming")
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------

FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprints", T.ArrayType(T.LongType())),
    ]
)


def _winnow_udf(window: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps = [], []
            for doc_id, shingles in zip(pdf["doc_id"], pdf["shingles"]):
                h = _shingle_hashes(list(shingles)).astype(np.int64)
                if len(h) == 0:
                    ids.append(doc_id)
                    fps.append([])
                    continue
                if len(h) <= window:
                    sel = {int(h.min())}
                else:
                    view = np.lib.stride_tricks.sliding_window_view(h, window)
                    sel = set(int(x) for x in view.min(axis=1))
                ids.append(doc_id)
                fps.append(sorted(sel))
            yield pd.DataFrame({"doc_id": ids, "fingerprints": fps})

    return fn


def winnow_fingerprints(docs: DataFrame, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (min-hash per sliding window of
    shingle hashes — the MOSS scheme). Ordered shingles, not distinct."""
    from ..plans.documents_gold import doc_shingles

    # winnowing needs positional shingles: rebuild without array_distinct
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), 0)
    d = docs.filter(F.col("text").isNotNull()).select("doc_id", toks.alias("toks"))
    idx = F.when(
        F.size("toks") >= 3, F.sequence(F.lit(1), F.size("toks") - 2)
    ).otherwise(F.array().cast("array<int>"))
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i),
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
        ),
    )
    shingled = d.select("doc_id", shingle.alias("shingles"))
    return shingled.mapInPandas(_winnow_udf(window), schema=FINGERPRINT_SCHEMA)
