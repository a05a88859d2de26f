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

All hashing is deterministic splitmix64-finalized Horner polynomial
hashing over the shingle bytes — reproducible across runs/machines (no
Python ``hash()``) AND re-derivable in ANSI/DuckDB SQL (HUGEINT mod-2⁶⁴
arithmetic), which is what lets the driver oracle-check the simhash and
winnowing outputs value-by-value. Hashing is fully vectorized: one numpy
pass over the Arrow batch's flattened byte buffer (offsets-array Horner
fold — zero per-shingle Python calls), signatures/bands by
``reduceat``/reshape reductions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import WORD_RE, word_tokens

_MERSENNE = np.uint64((1 << 61) - 1)
N_PERMS = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERMS // N_BANDS

# Horner polynomial base (the FNV-1 prime). h(s) = splitmix64(
# fold(h*P + byte mod 2^64)) — sequential in the char index but
# vectorized ACROSS all shingles of a batch (one masked numpy step per
# char position over the flattened buffer).
POLY_P = 1099511628211
_POLY_P = np.uint64(POLY_P)


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


def _hash_flat_strings(flat: list) -> np.ndarray:
    """64-bit hash per string, vectorized over the whole batch: build one
    Arrow string array (C-level, no per-string Python), Horner-fold its
    flattened uint8 buffer with one masked numpy step per char position,
    splitmix64-finalize. Shingles are ASCII by construction (WORD_RE
    tokens + spaces), so the byte fold equals the per-codepoint fold the
    DuckDB oracle computes with ``ord(substr(...))``."""
    if not len(flat):
        return np.empty(0, dtype=np.uint64)
    arr = pa.array(flat, type=pa.large_string())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    offs = offs[arr.offset : arr.offset + len(arr) + 1]
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts, lens = offs[:-1], np.diff(offs)
    h = np.zeros(len(flat), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for p in range(int(lens.max()) if len(lens) else 0):
            active = lens > p
            h[active] = h[active] * _POLY_P + buf[starts[active] + p].astype(
                np.uint64
            )
    return _splitmix64(h)


def _batch_segments(shingle_col: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hashes, seg_starts, seg_lens) for a batch column of shingle lists:
    every shingle of the batch hashed in one vectorized pass, plus the
    per-document segment layout for ``reduceat`` reductions."""
    lists = [list(x) for x in shingle_col]
    seg_lens = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
    flat = [s for x in lists for s in x]
    hashes = _hash_flat_strings(flat)
    seg_starts = np.concatenate(([0], np.cumsum(seg_lens)[:-1])) if len(lists) else np.empty(0, np.int64)
    return hashes, seg_starts, seg_lens


# fixed per-permutation affine coefficients (seeded, deterministic)
_rng = np.random.default_rng(20250101)
_A = _rng.integers(1, (1 << 61) - 1, size=N_PERMS, dtype=np.uint64) | np.uint64(1)
_B = _rng.integers(0, (1 << 61) - 1, size=N_PERMS, dtype=np.uint64)


def _minhash_sigs_batch(
    hashes: np.ndarray, seg_starts: np.ndarray, seg_lens: np.ndarray
) -> np.ndarray:
    """(n_docs × N_PERMS) minhash signatures for a whole batch: one affine
    transform over every shingle of the batch, per-document mins via
    ``minimum.reduceat`` — no per-document Python. Empty documents get
    the int64.max sentinel signature."""
    n = len(seg_lens)
    sigs = np.full((n, N_PERMS), np.iinfo(np.int64).max, dtype=np.int64)
    nonempty = seg_lens > 0
    if not nonempty.any():
        return sigs
    h = hashes % _MERSENNE
    # (perms × shingles) affine transform; min per doc segment. uint64
    # wraparound in the product is deliberate extra mixing (minhash only
    # needs a fixed pseudo-permutation, not exact modular arithmetic)
    with np.errstate(over="ignore"):
        vals = (_A[:, None] * h[None, :] + _B[:, None]) % _MERSENNE
    mins = np.minimum.reduceat(vals, seg_starts[nonempty], axis=1)
    # reduceat reduces from each start to the NEXT start in the index list
    # (not the segment end) — passing only non-empty starts keeps every
    # reduced span aligned with its segment except trailing-empty runs,
    # which contribute no rows of their own
    sigs[nonempty] = mins.T.astype(np.int64)
    return sigs


def _band_hashes_batch(sigs: np.ndarray) -> np.ndarray:
    """(n_docs × N_BANDS) band bucket hashes: fold each band's rows with
    splitmix64(bh ^ value), vectorized over (docs × bands) at once."""
    n = len(sigs)
    chunks = sigs.astype(np.uint64).reshape(n, N_BANDS, ROWS_PER_BAND)
    bh = np.broadcast_to(
        np.arange(1, N_BANDS + 1, dtype=np.uint64), (n, N_BANDS)
    ).copy()
    for r in range(ROWS_PER_BAND):
        bh = _splitmix64(bh ^ chunks[:, :, r])
    return bh.astype(np.int64)


MINHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
    ]
)


def _minhash_bands_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        if len(pdf) == 0:
            continue
        hashes, seg_starts, seg_lens = _batch_segments(pdf["shingles"])
        sigs = _minhash_sigs_batch(hashes, seg_starts, seg_lens)
        bands = _band_hashes_batch(sigs)
        n = len(pdf)
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(), N_BANDS),
                "band": np.tile(np.arange(N_BANDS, dtype=np.int32), n),
                "band_hash": bands.ravel(),
            }
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

    # eager localCheckpoint, not cache(): cache registers in the
    # CacheManager for the session's lifetime with no unpersist hook on
    # this API (the ann.py r3-ADVICE leak); the checkpoint's blocks are
    # reclaimed by the ContextCleaner once unreferenced
    sh = doc_shingles(docs).localCheckpoint(eager=True)
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
        if len(pdf) == 0:
            continue
        hashes, seg_starts, seg_lens = _batch_segments(pdf["shingles"])
        n = len(pdf)
        sigs = np.zeros(n, dtype=np.uint64)
        nonempty = seg_lens > 0
        if nonempty.any():
            # ±1 votes per bit over every shingle of the batch; per-doc
            # sums via add.reduceat (same contiguous-segment layout as
            # the minhash reduction)
            votes = (
                2
                * ((hashes[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
                    np.int64
                )
                - 1
            )
            scores = np.add.reduceat(votes, seg_starts[nonempty], axis=0)
            sig_ne = np.zeros(len(scores), dtype=np.uint64)
            for j in range(64):
                sig_ne |= (scores[:, j] > 0).astype(np.uint64) << np.uint64(j)
            sigs[nonempty] = sig_ne
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].to_numpy(), "simhash": sigs.astype(np.int64)}
        )


def simhash_signatures(shingled: DataFrame) -> DataFrame:
    return shingled.mapInPandas(_simhash_udf, schema=SIMHASH_SCHEMA)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ k via 4-block pigeonhole LSH:
    any pair within hamming ≤ 3 agrees exactly on ≥1 of 4 16-bit blocks."""
    from ..plans.documents_gold import doc_shingles

    # localCheckpoint, not cache() — see minhash_lsh_pairs note
    sig = simhash_signatures(doc_shingles(docs)).localCheckpoint(eager=True)
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
        T.StructField("fingerprint", T.LongType()),
    ]
)


def _winnow_udf(window: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            hashes, seg_starts, seg_lens = _batch_segments(pdf["shingles"])
            signed = hashes.astype(np.int64)
            doc_ids = pdf["doc_id"].to_numpy()
            n_docs = len(doc_ids)
            nonempty = seg_lens > 0
            sel_doc: list[np.ndarray] = []
            sel_fp: list[np.ndarray] = []
            # short docs (0 < len ≤ window): the single min fingerprint —
            # per-doc mins for the whole batch in one reduceat (contiguous
            # segments ⇒ each span reduces exactly to its segment)
            if nonempty.any():
                doc_min = np.minimum.reduceat(signed, seg_starts[nonempty])
                small = seg_lens[nonempty] <= window
                sel_doc.append(np.flatnonzero(nonempty)[small])
                sel_fp.append(doc_min[small])
            # long docs: ONE sliding-window min over the flat batch hash
            # array, keeping only windows fully inside a single segment
            # (start and end positions map to the same doc) — no per-doc
            # Python loop
            if (seg_lens > window).any():
                sw = np.lib.stride_tricks.sliding_window_view(signed, window).min(
                    axis=1
                )
                pos_doc = np.repeat(np.arange(n_docs), seg_lens)
                ok = (pos_doc[: len(sw)] == pos_doc[window - 1 :]) & (
                    seg_lens[pos_doc[: len(sw)]] > window
                )
                sel_doc.append(pos_doc[: len(sw)][ok])
                sel_fp.append(sw[ok])
            if not sel_doc:
                continue
            pair = np.unique(
                np.stack([np.concatenate(sel_doc), np.concatenate(sel_fp)], axis=1),
                axis=0,
            )
            yield pd.DataFrame(
                {"doc_id": doc_ids[pair[:, 0]], "fingerprint": pair[:, 1]}
            )

    return fn


def winnow_fingerprints(docs: DataFrame, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (min hash in each sliding window of
    k-gram hashes — the MOSS scheme) over ORDERED (positional) shingles.
    Emits relational scalar rows (doc_id, fingerprint) — one row per
    distinct selected fingerprint — the shape a containment join
    consumes (and the shape the driver canonicalizer can hash)."""
    # winnowing needs positional shingles: rebuild without array_distinct
    toks = word_tokens(F.col("text"))
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


# ---------------------------------------------------------------------------
# DuckDB oracle SQL: re-derive the EXACT splitmix64(Horner) hashes in
# HUGEINT mod-2^64 arithmetic so the driver can value-check simhash and
# winnowing outputs. The two big splitmix constants are multiplied via a
# 32-bit hi/lo split (a full 64×64 product overflows INT128).
# ---------------------------------------------------------------------------

_M_SQL = "18446744073709551616::HUGEINT"  # 2^64


def _mulmod_sql(a: str, c: int) -> str:
    """(a * c) mod 2^64 in HUGEINT without overflowing INT128."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"(((((({a})::HUGEINT % 4294967296::HUGEINT) * {hi}::HUGEINT)"
        f" % 4294967296::HUGEINT) * 4294967296::HUGEINT"
        f" + ({a})::HUGEINT * {lo}::HUGEINT) % {_M_SQL})"
    )


def _xorshift_sql(z: str, n: int) -> str:
    return f"xor(CAST({z} AS UBIGINT), CAST({z} AS UBIGINT) >> {n})"


def _hash_chain_cte_sql(src: str) -> str:
    """CTE chain mapping relation ``{src}`` (doc_id, pos, s) to ``hashed``
    (doc_id, pos, hu UBIGINT, h BIGINT): hu = splitmix64(Horner(s)),
    h = hu reinterpreted as signed int64 (numpy ``astype(int64)``)."""
    horner = (
        "CAST(list_reduce(list_prepend(0::HUGEINT, "
        "list_transform(range(1, length(s) + 1), "
        "i -> ord(substr(s, i, 1))::HUGEINT)), "
        f"(a, b) -> (a * {POLY_P}::HUGEINT + b) % {_M_SQL}) AS UBIGINT)"
    )
    return f"""
hx0 AS (SELECT doc_id, pos, {horner} AS x0 FROM {src}),
hx1 AS (SELECT doc_id, pos,
        CAST((x0::HUGEINT + 11400714819323198485::HUGEINT) % {_M_SQL} AS UBIGINT) AS x1
        FROM hx0),
hx2 AS (SELECT doc_id, pos,
        CAST({_mulmod_sql(_xorshift_sql('x1', 30), 0xBF58476D1CE4E5B9)} AS UBIGINT) AS z1
        FROM hx1),
hx3 AS (SELECT doc_id, pos,
        CAST({_mulmod_sql(_xorshift_sql('z1', 27), 0x94D049BB133111EB)} AS UBIGINT) AS z2
        FROM hx2),
hashed AS (SELECT doc_id, pos, {_xorshift_sql('z2', 31)} AS hu,
           CAST(CASE WHEN {_xorshift_sql('z2', 31)} >= 9223372036854775808::UBIGINT
                THEN ({_xorshift_sql('z2', 31)})::HUGEINT - {_M_SQL}
                ELSE ({_xorshift_sql('z2', 31)})::HUGEINT END AS BIGINT) AS h
           FROM hx3)"""


def winnow_oracle_sql(window: int = 4) -> str:
    """DuckDB re-derivation of ``winnow_fingerprints`` (same positional
    shingles, same hash, same sliding-window-min selection)."""
    return f"""
WITH l AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS toks
    FROM documents WHERE text IS NOT NULL
),
e AS (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                  i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s,
           unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS pos
    FROM l
),
{_hash_chain_cte_sql('e')},
sgn AS (
    SELECT doc_id, pos, h,
           count(*) OVER (PARTITION BY doc_id) AS n
    FROM hashed
),
win AS (
    SELECT doc_id, pos, n,
           CASE WHEN n <= {window} THEN min(h) OVER (PARTITION BY doc_id)
                ELSE min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
           END AS fp
    FROM sgn
)
SELECT DISTINCT doc_id, fp AS fingerprint
FROM win
WHERE n <= {window} OR pos <= n - {window} + 1
"""


def simhash_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB re-derivation of ``simhash_pairs``: same DISTINCT shingles,
    same hash, bit-majority signature, all-pairs hamming filter (the
    Spark plan's 4-block pigeonhole join is a lossless optimization of
    exactly this semantics for hamming ≤ 3)."""
    return f"""
WITH l AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS toks
    FROM documents WHERE text IS NOT NULL
),
g AS (
    SELECT doc_id, list_distinct(list_transform(
        range(1, greatest(len(toks) - 2, 0) + 1),
        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS shingles
    FROM l
),
e AS (SELECT doc_id, unnest(shingles) AS s, 0::BIGINT AS pos FROM g),
{_hash_chain_cte_sql('e')},
bits AS (
    SELECT doc_id, j,
           CASE WHEN (hu >> j::INTEGER) & 1::UBIGINT = 1::UBIGINT
                THEN 1 ELSE -1 END AS pm
    FROM hashed CROSS JOIN (SELECT unnest(range(0, 64)) AS j) jj
),
score AS (SELECT doc_id, j, sum(pm) AS sc FROM bits GROUP BY 1, 2),
sig AS (
    SELECT doc_id,
           CAST(CASE WHEN su >= 9223372036854775808::HUGEINT
                THEN su - {_M_SQL} ELSE su END AS BIGINT) AS simhash
    FROM (SELECT doc_id,
                 sum(CASE WHEN sc > 0 THEN (1::UBIGINT << j::INTEGER)::HUGEINT
                     ELSE 0::HUGEINT END) AS su
          FROM score GROUP BY doc_id)
)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""
