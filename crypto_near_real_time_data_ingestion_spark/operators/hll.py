"""HyperLogLog distinct-count sketch — the MAX-merge member of the
mergeable-summaries family.

Why it exists beside ``approx_count_distinct``: Spark's built-in HLL++
answers one query inside one job and its sketch never leaves the JVM.
A 10^12-turn stream needs the REGISTERS as data — per-batch register
deltas landing in a sink, merged across days/restarts/backfills, and
queryable at any time without re-scanning the stream (the reference
keeps only per-window exact counts, ``gold_features_base_job.py``'s
grouped aggregates; this is the piece that replaces them when the key
space no longer fits: distinct conversations/users ever seen, in
``m = 2^p`` registers regardless of cardinality).

Family position (the engine's three sketch-merge classes):

  * Misra-Gries (``heavy_hitters``):  SUM-merge + trim   (additive)
  * Count-Min   (``countmin``):       SUM-merge          (additive)
  * HyperLogLog (this module):        MAX-merge          (idempotent!)

Max-merge is the structurally different one: ``max(a, a) == a``, so
folding the SAME register delta twice is a no-op. ``HllSink`` therefore
tolerates replayed deltas BY ALGEBRA, not just by commit log — the only
sink in the family whose read view is correct even if exactly-once
bookkeeping fails — and the commit log it still keeps is for lineage
manifests and compaction GC, not correctness. The pytest contract pins
exactly that (``test_hll.py::test_sink_replay_is_algebraically_noop``).

Layout: a sketch frame is the NONZERO registers — ``(bucket int,
rho int)``, ≤ m rows total; absent buckets are rho = 0. Build is the
Count-Min shape: ``xxhash64`` JVM-side (salted ``'hll:{seed}:'`` per
the salted-decision rule — this module's draws must never correlate
with the split/dedup/DSIR bytes), then a per-partition numpy fold
emitting ≤ m register partials per partition, then ``groupBy(bucket).
max(rho)`` — shuffle ≤ m rows per partition at ANY input size.

rho is computed on the UPPER 64−p bits (bucket on the low p bits), via
an exact vectorized floor-log2 (binary-reduction shifts — float log2
rounds wrong near 2^k for k > 53, so it never touches floats).

Estimation is the original Flajolet et al. 2007 estimator with the
small-range linear-counting correction (the HLL++ piece that matters at
64-bit hashes; the large-range correction is a 32-bit-hash artifact and
correctly absent). Approximate ⇒ pytest-venue per the HLL/GK/MG rule:
error-bound contracts vs the exact ``countDistinct`` twin plus a
bit-equal numpy reference — never a value-hash driver entry (unlike
MG/CMS there is NO exact regime to grade: every register is lossy).

Reference semantics anchored: the reference's per-window grouped counts
(``gold_features_base_job.py``) are the exact twin this sketch replaces
when keys outgrow memory; SURVEY §2.2 P25 (hash expressions) supplies
the hashing discipline.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# p for the streaming maintenance query (engine query "hll"): 4096
# registers ≈ 1.6% stderr on distinct conversations, 4096 rows of sink
# state per delta at ANY stream length. Bound at build time by the
# sink's persisted-params sidecar like STREAM_EXACT_WIDTH for the CMS.
STREAM_HLL_P = 12

_REG_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("rho", T.IntegerType()),
    ]
)


def _check_p(p: int) -> int:
    """Register-count exponent: m = 2^p. p ≥ 4 keeps the alpha constant
    in its published regime; p ≤ 24 keeps a register frame comfortably
    a broadcast/driver-bounded object (16M rows max)."""
    if not 4 <= p <= 24:
        raise ValueError(f"p must be in [4, 24], got {p}")
    return p


def hll_salt(seed: int) -> str:
    """The load-bearing salt prefix (single-purpose domain: HLL bucket
    draws). Shared by build and the numpy reference — never inline it."""
    return f"hll:{seed}:"


def _floor_log2_u64(x: np.ndarray) -> np.ndarray:
    """Exact floor(log2(x)) for uint64 x > 0, vectorized binary
    reduction — no float round-trip (log2(2^63 − 1) rounds UP to 63.0
    in float64, which would off-by-one rho near register boundaries)."""
    r = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        r[big] += s
        v[big] >>= np.uint64(s)
    return r


def hll_rho_buckets(h64: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per hash — THE register mapping, shared by the
    distributed build and the test reference (single-definition rule).
    bucket = low p bits; rho = leading-zero count of the remaining
    64−p bits + 1 (∈ [1, 64−p+1])."""
    _check_p(p)
    h = h64.astype(np.int64, copy=False).view(np.uint64)
    m = np.uint64((1 << p) - 1)
    bucket = (h & m).astype(np.int64)
    w = h >> np.uint64(p)
    width = 64 - p
    rho = np.full(h.shape, width + 1, dtype=np.int64)
    nz = w != 0
    # leftmost 1-bit at position floor_log2(w) ⇒ leading zeros =
    # width − 1 − floor_log2(w); rho = that + 1
    rho[nz] = width - _floor_log2_u64(w[nz])
    return bucket, rho


def _hll_partial(p: int):
    m = 1 << p

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        regs = np.zeros(m, dtype=np.int64)
        for pdf in batches:
            h = pdf["h64"].to_numpy(dtype=np.int64, na_value=0)
            if not len(h):
                continue
            bucket, rho = hll_rho_buckets(h, p)
            np.maximum.at(regs, bucket, rho)
        nz = np.nonzero(regs)[0]
        yield pd.DataFrame(
            {"bucket": nz.astype(np.int32), "rho": regs[nz].astype(np.int32)}
        )

    return fn


def hll_build(
    df: DataFrame, item_col: str, p: int = 12, seed: int = 0
) -> DataFrame:
    """Register frame over one item occurrence per input row (duplicates
    are free — max absorbs them; that IS the sketch's point). NULL items
    are absences, not countable keys. Output: nonzero registers only,
    (bucket int, rho int), ≤ 2^p rows."""
    _check_p(p)
    hashed = df.filter(F.col(item_col).isNotNull()).select(
        F.xxhash64(
            F.concat(F.lit(hll_salt(seed)), F.col(item_col).cast("string"))
        ).alias("h64")
    )
    partials = hashed.mapInPandas(_hll_partial(p), _REG_SCHEMA)
    return partials.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Pointwise register MAX = the sketch of the union (mergeable-
    summaries property; Flajolet et al. 2007 §4). Idempotent:
    merge(s, s) ≡ s — the algebra the sink's replay tolerance rests on."""
    if not sketches:
        raise ValueError("need at least one sketch")
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("bucket").agg(F.max("rho").alias("rho"))


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate(sketch: DataFrame, p: int) -> DataFrame:
    """Cardinality estimate as a 1-row frame (n_distinct_est double,
    n_registers_hit long) — one agg over ≤ 2^p register rows; absent
    buckets contribute 2^0 = 1 to the harmonic sum and count as zeros
    for the linear-counting correction. Distributed all the way: no
    driver-side register materialization."""
    _check_p(p)
    m = 1 << p
    agg = sketch.filter(F.col("bucket").isNotNull()).agg(
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)).alias(
            "hsum_hit"
        ),
        F.count(F.lit(1)).alias("hit"),
    )
    hsum = F.col("hsum_hit") + (F.lit(m) - F.col("hit"))  # absent ⇒ 2^-0
    raw = F.lit(_alpha(m) * m * m) / hsum
    zeros = F.lit(m) - F.col("hit")
    # small-range correction: linear counting while raw ≤ 2.5m and some
    # register is still zero (Flajolet et al. 2007 fig. 3)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        est.alias("n_distinct_est"), F.col("hit").cast("long").alias("n_registers_hit")
    )


def hll_standard_error(p: int) -> float:
    """The published relative standard error 1.04/√m — what the pytest
    contract's tolerance is denominated in."""
    return 1.04 / math.sqrt(1 << p)


_WREG_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("rho", T.IntegerType()),
    ]
)


def _hll_windowed_partial(p: int):
    m = 1 << p

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-window register dicts would be per-row Python; instead
        # factorize the window column and fold into ONE flat array
        # indexed by window_idx·m + bucket (np.maximum.at — same fold
        # as _hll_partial, lifted one dimension)
        acc: dict[object, np.ndarray] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            codes, uniques = pd.factorize(pdf["window_start"])
            h = pdf["h64"].to_numpy(dtype=np.int64, na_value=0)
            bucket, rho = hll_rho_buckets(h, p)
            flat = np.zeros(len(uniques) * m, dtype=np.int64)
            np.maximum.at(flat, codes.astype(np.int64) * m + bucket, rho)
            for i, w in enumerate(uniques):
                regs = acc.setdefault(w, np.zeros(m, dtype=np.int64))
                np.maximum(regs, flat[i * m : (i + 1) * m], out=regs)
        outs = []
        for w, regs in acc.items():
            nz = np.nonzero(regs)[0]
            outs.append(
                pd.DataFrame(
                    {
                        "window_start": np.repeat(
                            pd.Timestamp(w), len(nz)
                        ),
                        "bucket": nz.astype(np.int32),
                        "rho": regs[nz].astype(np.int32),
                    }
                )
            )
        yield (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                {
                    "window_start": pd.Series([], dtype="datetime64[us]"),
                    "bucket": pd.Series([], dtype=np.int32),
                    "rho": pd.Series([], dtype=np.int32),
                }
            )
        )

    return fn


def hll_windowed_build(
    df: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    p: int = 12,
    seed: int = 0,
) -> DataFrame:
    """Per-event-time-window register frames — distinct-count sketches
    for EVERY tumbling window in one pass: (window_start, bucket, rho),
    ≤ 2^p rows per window however many items the window saw. This is
    the bounded-state form of "distinct active conversations per hour"
    at 10^12 turns: the exact per-window countDistinct's state is the
    window's key set; this is 2^p registers, and windows max-merge
    independently (backfills/replays fold in idempotently)."""
    _check_p(p)
    # NULL ts must drop WITH the NULL items: a NaT window factorizes to
    # code -1 in the partial, and the flat-array fold would wrap that
    # negative index into the LAST real window's registers (or raise on
    # an all-NULL batch) — silently inflating its estimate (r5 review)
    hashed = df.filter(
        F.col(item_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.window(F.col(ts_col), window).start.alias("window_start"),
        F.xxhash64(
            F.concat(F.lit(hll_salt(seed)), F.col(item_col).cast("string"))
        ).alias("h64"),
    )
    partials = hashed.mapInPandas(_hll_windowed_partial(p), _WREG_SCHEMA)
    return partials.groupBy("window_start", "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_windowed_estimate(sketch: DataFrame, p: int) -> DataFrame:
    """Per-window cardinality estimates from a windowed register frame:
    (window_start, n_distinct_est double, n_registers_hit long) — same
    estimator as ``hll_estimate``, grouped; one agg over ≤ windows·2^p
    rows."""
    _check_p(p)
    m = 1 << p
    agg = sketch.groupBy("window_start").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("hsum_hit"),
        F.count(F.lit(1)).alias("hit"),
    )
    hsum = F.col("hsum_hit") + (F.lit(m) - F.col("hit"))
    raw = F.lit(_alpha(m) * m * m) / hsum
    zeros = F.lit(m) - F.col("hit")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        "window_start",
        est.alias("n_distinct_est"),
        F.col("hit").cast("long").alias("n_registers_hit"),
    )


def hll_reference(h64: np.ndarray, p: int) -> np.ndarray:
    """Single-machine register build from the same xxhash64 values —
    the bit-equality oracle for the distributed build (the
    ``cms_reference`` pattern: change one, re-pin the other). Dense
    m-length array; compare against the sparse frame via its nonzeros."""
    regs = np.zeros(1 << p, dtype=np.int64)
    if len(h64):
        bucket, rho = hll_rho_buckets(h64, p)
        # np.maximum.at — same fold as _hll_partial (the
        # change-one-re-pin-the-other rule)
        np.maximum.at(regs, bucket, rho)
    return regs
