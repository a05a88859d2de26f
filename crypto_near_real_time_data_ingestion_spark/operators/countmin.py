"""Count-Min sketch — the mergeable frequency sketch that completes the
engine's sketch family (Misra-Gries ``heavy_hitters``, HLL distinct,
GK percentiles, Bloom membership): point-frequency estimates over a
key space far too large to count exactly, in O(depth × width) memory
regardless of corpus size.

Where Misra-Gries answers "which items are frequent?" (top-k, certified
under-counts), the CMS answers "how often does THIS item occur?" for
ANY item, with certified OVER-counts — the sketch to keep per shard /
per micro-batch when the query set is not known at build time
(n-gram frequency service, per-token corpus statistics at 10^13 tokens,
join-size estimation).

Cormode & Muthukrishnan, "An Improved Data Stream Summary: the
Count-Min Sketch and its Applications", J. Algorithms 55 (2005):
a depth×width counter matrix; row i increments cell h_i(x); the
estimate is min_i C[i, h_i(x)].

  * est(x) ≥ true(x) ALWAYS (counters only ever add) — deterministic;
  * row-wise expected overcount E[est_i − true] ≤ 2·N/width with the
    multiply-shift hash family used here (2-approximately-universal,
    Dietzfelbinger et al. 1997: collision probability ≤ 2/width), so
    P(est − true ≥ 2e·N/width) ≤ e^(−depth) by Markov + row
    independence. N = total item count.

Hashing: the 64-bit item hash is Spark's own ``xxhash64`` (computed
Catalyst-side, so the JVM does the string hashing and a numpy reference
can reproduce the sketch from the same hashes); row i's bucket is the
multiply-shift ``(a_i * h) >> (64 − log2(width))`` with a_i an odd
64-bit constant derived from md5("cms:{seed}:{i}") — deterministic across
platforms, vectorized as wrapping uint64 numpy arithmetic (kept OUT of
Catalyst on purpose: Spark 4's ANSI mode makes 64-bit multiply overflow
throw, numpy uint64 wraps, which IS the hash).

Scale shape (the HLL/GK/MG pattern — partial sketch per partition,
exact merge):

  phase 1  one map-only pass: Catalyst computes xxhash64(item);
           mapInPandas folds each partition's hashes into a local
           depth×width counter matrix via vectorized ``np.bincount``,
           emitting only the NONZERO cells (≤ depth·width rows per
           partition, e.g. 4×1024 → ≤4096, independent of rows read);
  phase 2  groupBy(row, col).sum — kilobytes into the shuffle at any
           corpus size. Pointwise sum of CMS matrices IS the CMS of the
           union (Agarwal et al., "Mergeable Summaries", PODS 2012),
           which also makes per-micro-batch deltas additive under the
           streaming sink exactly like the MG summaries.

Every depth row's cells sum to N, so the merged sketch carries its own
total (``cms_total``) and the ±ε·N bound needs no side channel.

Point queries (``cms_estimates``) stay distributed: the query items
hash the same way, join the (row, col) coordinates against the
broadcast sketch (depth·width rows — tiny by construction), and take
min over depth; an item that misses every cell is correctly estimated 0
via the left join's coalesce.

Approximate with certified bounds ⇒ verified by pytest contracts
against the exact ``groupBy`` twin plus a bit-equal numpy reference
(the HLL/GK/MG rule). The one value-hash driver entry is the same
EXACT-REGIME form Misra-Gries grades (``streaming_heavy_hitters``):
at ``STREAM_EXACT_WIDTH`` the graded vocabulary never collides in all
depth rows, so the estimates EQUAL the exact GROUP BY and the
streaming sketch-maintenance path (per-batch deltas, additive
commit-log sink, pointwise merge) is driver-graded end-to-end.

Reference semantics anchored: the reference keeps per-window exact
aggregates (gold_features_base_job.py's grouped counts) — this is the
bounded-memory form of the same per-key counting once keys outgrow a
reduce-side hash table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CELL_SCHEMA = T.StructType(
    [
        T.StructField("row", T.IntegerType()),
        T.StructField("col", T.IntegerType()),
        T.StructField("count", T.LongType()),
    ]
)

_COORD_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("col", T.IntegerType()),
    ]
)


def cms_hash_params(depth: int, seed: int = 0) -> np.ndarray:
    """The depth odd multipliers a_i, derived from md5(f"cms:{seed}:{i}")
    — platform-independent, reproducible by the numpy reference. The
    "cms:" prefix is the load-bearing salt per the salted-decision rule
    (single-purpose domain: CMS row hashing)."""
    out = np.empty(depth, dtype=np.uint64)
    for i in range(depth):
        digest = hashlib.md5(f"cms:{seed}:{i}".encode()).digest()
        out[i] = np.uint64(int.from_bytes(digest[:8], "big") | 1)
    return out


def _check_width(width: int) -> int:
    """Multiply-shift needs a power-of-two width ≥ 2 (width 1 would make
    the shift 64, undefined for a 64-bit integer); returns 64 − log2."""
    shift = width.bit_length() - 1
    if width < 2 or (1 << shift) != width:
        raise ValueError(f"width must be a power of two >= 2, got {width}")
    return 64 - shift


def cms_cols(h64: np.ndarray, mults: np.ndarray, width: int) -> np.ndarray:
    """Bucket index per (row, item): ``(a_i * h) >> (64 − log2 w)`` on
    wrapping uint64 — shape (depth, n). THE hash, shared by build, query
    and the test reference (single-definition rule)."""
    shift = _check_width(width)
    h = h64.astype(np.int64, copy=False).view(np.uint64)
    return (mults[:, None] * h[None, :]) >> np.uint64(shift)


def _cms_partial(depth: int, width: int, seed: int):
    mults = cms_hash_params(depth, seed)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            h = pdf["h64"].to_numpy(dtype=np.int64, na_value=0)
            if not len(h):
                continue
            cols = cms_cols(h, mults, width)
            for i in range(depth):
                mat[i] += np.bincount(cols[i].astype(np.intp), minlength=width)
        rows, cols = np.nonzero(mat)
        yield pd.DataFrame(
            {
                "row": rows.astype(np.int32),
                "col": cols.astype(np.int32),
                "count": mat[rows, cols],
            }
        )

    return fn


def cms_build(
    df: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Build the merged sketch over one item occurrence per input row.
    Output: the nonzero cells — (row int, col int, count long). NULL
    items are dropped (they are absences, not a countable key)."""
    _check_width(width)
    hashed = (
        df.filter(F.col(item_col).isNotNull())
        .select(F.xxhash64(F.col(item_col).cast("string")).alias("h64"))
    )
    partials = hashed.mapInPandas(_cms_partial(depth, width, seed), _CELL_SCHEMA)
    return partials.groupBy("row", "col").agg(F.sum("count").alias("count"))


def token_cms(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Sketch of word-token frequencies — the CMS twin of
    ``heavy_hitters.token_counts_exact`` over the SAME tokenization
    (``word_tokens``, the family-wide single definition). The explode is
    map-only; nothing keyed by token ever shuffles."""
    from ..functions.text import word_tokens

    toks = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(word_tokens(F.col(text_col))).alias("token"))
    )
    return cms_build(toks, "token", width=width, depth=depth, seed=seed)


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Pointwise sum of same-parameter sketches = the sketch of the
    union (mergeable-summaries property); what a streaming sink's read
    view does to per-batch deltas."""
    if not sketches:
        raise ValueError("need at least one sketch")
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("row", "col").agg(F.sum("count").alias("count"))


def cms_total(sketch: DataFrame) -> DataFrame:
    """N (total items folded in): every depth row sums to it; row 0 is
    read. 1-row frame for the ε·N bound."""
    return sketch.filter(F.col("row") == 0).agg(
        F.coalesce(F.sum("count"), F.lit(0)).alias("n_total")
    )


def check_sketch_params(sketch: DataFrame, width: int, depth: int) -> None:
    """Structural half of the parameter binding: a sketch whose cells
    exceed [0, depth) × [0, width) was built under different parameters
    — fail loudly instead of silently breaking the never-underestimate
    (or, for drift, the certified-floor) guarantee. A SEED mismatch is
    structurally invisible; bind it via ``CountMinSink``'s persisted
    params or your own config, never by convention."""
    _check_width(width)
    bounds = sketch.agg(
        F.max("row").alias("mr"), F.max("col").alias("mc")
    ).collect()[0]  # sketch is ≤ depth·width rows — a bounded driver action
    if bounds["mr"] is not None and (
        bounds["mr"] >= depth or bounds["mc"] >= width
    ):
        raise ValueError(
            f"sketch has cells up to (row={bounds['mr']}, col={bounds['mc']}) "
            f"— inconsistent with depth={depth}, width={width}; the "
            "never-underestimate guarantee would silently break"
        )


def _coord_map(depth: int, width: int, seed: int):
    mults = cms_hash_params(depth, seed)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            h = pdf["h64"].to_numpy(dtype=np.int64, na_value=0)
            cols = cms_cols(h, mults, width)
            n = len(h)
            yield pd.DataFrame(
                {
                    "item": np.tile(pdf["item"].to_numpy(), depth),
                    "row": np.repeat(
                        np.arange(depth, dtype=np.int32), n
                    ),
                    "col": cols.reshape(-1).astype(np.int32),
                }
            )

    return fn


def cms_estimates(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Point-frequency estimates for a frame of query items. Output:
    (item string, est long) with est = min over depth rows; never an
    underestimate, overestimate bounded as in the module docstring.

    Distributed shape: items hash map-only into depth (row, col)
    coordinates (duplicate items fold at the final min, so no distinct
    pre-shuffle); the sketch (≤ depth·width rows by construction) is
    BROADCAST to the left join, so no item-keyed shuffle happens until
    the final groupBy(item) min — shuffle ∝ depth·|items|.

    Parameter binding: the query's (width, depth, seed) MUST be the
    build's — the structural half (a cell outside [0,depth)×[0,width))
    fails loudly here; a seed mismatch is structurally invisible, so
    bind it through ``CountMinSink``'s persisted params or your own
    config, never by convention."""
    check_sketch_params(sketch, width, depth)
    hashed = items.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).cast("string").alias("item"),
        F.xxhash64(F.col(item_col).cast("string")).alias("h64"),
    )
    coords = hashed.mapInPandas(_coord_map(depth, width, seed), _COORD_SCHEMA)
    joined = coords.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy("item").agg(
        F.min(F.coalesce(F.col("count"), F.lit(0))).alias("est")
    )


def cms_reference(
    h64: np.ndarray, width: int, depth: int, seed: int = 0
) -> np.ndarray:
    """Single-machine numpy build from the same xxhash64 values — the
    bit-equality oracle (the ``ann._kmeans_fit`` small-data-oracle
    pattern: change one, re-pin the other)."""
    mults = cms_hash_params(depth, seed)
    mat = np.zeros((depth, width), dtype=np.int64)
    cols = cms_cols(h64, mults, width)
    for i in range(depth):
        # bincount, not np.add.at — same fold as _cms_partial (the
        # change-one-re-pin-the-other rule)
        mat[i] += np.bincount(cols[i].astype(np.intp), minlength=width)
    return mat


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Equi-join size estimation from two same-parameter sketches —
    the second classic CMS application (Cormode-Muthukrishnan §4.2):
    |A ⋈ B| on a key = Σ_x f_A(x)·f_B(x) = the true inner product,
    estimated as min_i Σ_j A[i,j]·B[i,j]. Never an underestimate
    (cross terms only ever add); row-wise expected overcount
    ≤ 2·N_A·N_B/width, so min over depth rows concentrates like the
    point query. This is what a planner consults before choosing a
    join strategy when both sides are too large to count exactly —
    the sketches are depth·width cells however large the tables are.

    Shape: one hash join on (row, col) between two ≤ depth·width-cell
    frames (both broadcastable by construction), one groupBy(row) sum,
    one 1-row min. Output: a single row (est long)."""
    prod = a.alias("a").join(
        F.broadcast(b.alias("b")), ["row", "col"]
    ).select(
        "row", (F.col("a.count") * F.col("b.count")).alias("p")
    )
    per_row = prod.groupBy("row").agg(F.sum("p").alias("ip"))
    # a depth row with NO colliding cells has true inner product 0 —
    # min(coalesce) over the d rows must see it, so left-join against
    # the row ids present in `a` (every build populates all d rows
    # unless the corpus side is empty, when the join is empty and the
    # estimate correctly folds to 0)
    rows_a = a.select("row").distinct()
    return (
        rows_a.join(per_row, "row", "left")
        .agg(
            F.coalesce(F.min(F.coalesce(F.col("ip"), F.lit(0))), F.lit(0)).alias(
                "est"
            )
        )
    )


# ---------------------------------------------------------------------------
# streaming exact-regime grading (the MG STREAM_EXACT_K pattern)
# ---------------------------------------------------------------------------

# Width for the driver-graded streaming sketch: 2^16 cells per row over a
# vocabulary of a few hundred word tokens — a token is mis-estimated only
# if it collides in EVERY one of the 4 rows (P ≈ |V|·(|V|/w)^4 ≈ 1e-8 at
# |V|=500, and deterministic for the fixed seed/corpus: exactness is
# re-verified by the oracle on every run, not assumed).
STREAM_EXACT_WIDTH = 1 << 16

# silver CTE matches the other transcript oracles (any-wins dedup); at
# STREAM_EXACT_WIDTH the merged sketch's point estimates equal the exact
# GROUP BY, so the oracle is the plain token count (no bound column —
# the CMS has no certified under-count; its over-count is zero here)
STREAM_CMS_ORACLE_SQL_TEMPLATE = """
WITH cleansed AS (
    SELECT CAST(conv_id AS VARCHAR) AS conv_id,
           CAST(turn_idx AS INTEGER) AS turn_idx, text
    FROM read_parquet('{path}')
    WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL AND turn_idx >= 0
      AND role IS NOT NULL AND ts IS NOT NULL
),
silver AS (
    SELECT conv_id, turn_idx, min(text) AS text
    FROM cleansed GROUP BY conv_id, turn_idx
),
toks AS (
    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
    FROM silver WHERE text IS NOT NULL
)
SELECT token, count(*) AS count
FROM toks GROUP BY token
"""
