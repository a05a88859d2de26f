"""Mergeable Bloom-filter membership — decontamination against a
reference set too large to broadcast as an exact dictionary.

``doc_decontaminate`` (plans/documents_gold.py) broadcasts the eval
suite's DISTINCT shingle dictionary and semi-joins every train shingle
against it. That is the right shape while the reference set is a
benchmark suite (MBs). The moment the reference set is itself a corpus
— "drop anything that overlaps the previous training run", "filter
against a 10 TB blocklist" — the exact dictionary no longer fits in a
broadcast, and the join degrades to a full shuffle of the 100 TB train
side. The classical fix is a Bloom filter: an m-bit bitmap is a FIXED
size (2^27 bits = 16 MB) no matter how many keys went in, membership
has NO false negatives, and the false-positive rate is a closed-form
knob ((1 - e^{-kn/m})^k). One-sided error is exactly what
decontamination wants: a false positive drops a clean document (cheap
at corpus scale), a false negative would leak eval data (the bloom
never does).

Scale shape (all stages hold at 1000 executors):
  * BUILD — bit positions are computed JVM-side (``xxhash64`` twice,
    Kirsch-Mitzenmacher double hashing, pure Catalyst), then reduced
    to ``<= m/64`` ``(word, bits)`` rows by a ``bit_or`` aggregate.
    The shuffle domain is bounded by the filter size, not the key
    count — map-side partial ``bit_or`` collapses each partition to at
    most m/64 rows before the exchange. The driver materializes the
    bounded bitmap (same contract as the IVF centroid sample:
    ``operators/ann.py`` — a driver action bounded by a constant, not
    by data size).
  * PROBE — map-only. Positions again come from the SAME Catalyst
    expressions (bit-identical to the build side, no Python hashing to
    keep in sync), and a vectorized Arrow-batched pandas UDF tests
    bits against the broadcast bitmap with numpy. Probing a document's
    whole shingle array happens per row (``flatten(transform(...))``),
    so per-document decontamination needs ZERO shuffles — the counter
    the exact path pays a groupBy for falls out of the reshape.

Reference parity: the hash-expressions family (SURVEY §2.2 P25) and
the broadcast-dimension join (§2.5 J1), recombined for the
dataset-assembly pipeline; the published-recipe analog is the
Bloom-filter dedup/decontam pass in large-corpus pipelines (CCNet,
Dolma) whose membership structure must be mergeable across shards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 1 << 20  # 128 KiB bitmap; raise to 2^27+ for corpus-scale sets
BLOOM_K = 5

# second-hash salt: xxhash64(col, lit(SALT)) is a different 64-bit hash
# of the same key, giving the independent stride double hashing needs
_SALT = "bloom-h2"


def bloom_positions(col: Column, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> Column:
    """The k bit positions for a key, as ``array<bigint>`` — pure Catalyst.

    Kirsch-Mitzenmacher double hashing: pos_i = (h1 + i*h2) mod m. Both
    hashes are reduced mod m BEFORE the linear combination so the
    arithmetic stays far from int64 overflow (ANSI mode would throw);
    the stride is forced into [1, m-1] so a zero stride can't collapse
    all k probes onto one bit.
    """
    h1 = F.pmod(F.xxhash64(col), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(_SALT)), F.lit(m_bits - 1)) + F.lit(1)
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)])


def build_bloom(
    keys: DataFrame, col: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> np.ndarray:
    """Build the bitmap over a key column; returns ``int64[m_bits/64]``.

    The aggregate output is bounded by m/64 rows regardless of key
    count (the whole point), so the final ``collect()`` is a
    constant-bounded driver action, not a data-sized one.
    """
    # NULL keys are ABSENCES (the sketch-family contract, cf. cms_build
    # / hll_build): xxhash64(NULL) returns the seed, so an unfiltered
    # NULL would set one phantom key's bits and every NULL-keyed probe
    # would answer maybe_member=true (r5 review)
    pos = keys.filter(F.col(col).isNotNull()).select(
        F.explode(bloom_positions(F.col(col), m_bits, k)).alias("pos")
    )
    words = (
        pos.select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    arr = np.zeros(m_bits // 64, dtype=np.int64)
    for r in words:
        arr[r["w"]] = r["bits"]
    return arr


def theoretical_fpp(n_keys: int, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> float:
    """Closed-form false-positive probability for sizing decisions."""
    return float((1.0 - np.exp(-k * n_keys / m_bits)) ** k)


def _test_bits(flat_pos: np.ndarray, words: np.ndarray) -> np.ndarray:
    """Bit test per position over the int64 word array (signed-safe:
    arithmetic shift then ``& 1`` extracts the bit regardless of sign)."""
    return ((words[flat_pos >> 6] >> (flat_pos & 63)) & 1).astype(bool)


def probe_bloom(
    df: DataFrame,
    col: str,
    words: np.ndarray,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    out: str = "maybe_member",
) -> DataFrame:
    """Per-row membership test for a scalar key column (map-only)."""
    bc = df.sparkSession.sparkContext.broadcast(words)

    @F.pandas_udf("boolean")
    def _member(pos: pd.Series) -> pd.Series:
        w = bc.value
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in pos])
        return pd.Series(_test_bits(flat, w).reshape(-1, k).all(axis=1))

    # NULL keys: nothing to test — answer NULL, never the phantom
    # seed-hash membership (family contract, see build_bloom note)
    return df.withColumn(
        out,
        F.when(
            F.col(col).isNotNull(),
            _member(bloom_positions(F.col(col), m_bits, k)),
        ),
    )


def bloom_count_members(
    df: DataFrame,
    arr_col: str,
    words: np.ndarray,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    out: str = "n_member",
) -> DataFrame:
    """Count of array elements that test positive, per row — map-only.

    Positions for the whole array come from one Catalyst
    ``flatten(transform(...))`` (k positions per element, element order
    preserved), so the UDF sees one flat int64 vector per row and the
    per-element membership is a single batch-wide reshape: no explode,
    no groupBy, no shuffle.
    """
    bc = df.sparkSession.sparkContext.broadcast(words)

    @F.pandas_udf("long")
    def _count(pos: pd.Series) -> pd.Series:
        w = bc.value
        n = len(pos)
        if n == 0:
            return pd.Series([], dtype="int64")
        rows = [np.asarray(p, dtype=np.int64) for p in pos]
        lens = np.fromiter((r.size for r in rows), dtype=np.int64, count=n)
        flat = np.concatenate(rows) if lens.sum() else np.empty(0, dtype=np.int64)
        member = (
            _test_bits(flat, w).reshape(-1, k).all(axis=1)
            if flat.size
            else np.empty(0, dtype=bool)
        )
        # per-row sums via cumsum differencing (reduceat mishandles
        # empty segments: it returns the element at the start index)
        cm = np.concatenate([[0], np.cumsum(member, dtype=np.int64)])
        ends = np.cumsum(lens // k)
        starts = ends - lens // k
        return pd.Series(cm[ends] - cm[starts])

    return df.withColumn(
        out,
        _count(
            F.flatten(
                F.transform(
                    # NULL elements are absences (family contract)
                    F.filter(F.col(arr_col), lambda s: s.isNotNull()),
                    lambda s: bloom_positions(s, m_bits, k),
                )
            )
        ),
    )
