"""Product-quantization (PQ) ANN: memory-bounded similarity search.

Completes the similarity-search family (exact block-GEMM → LSH → IVF →
PQ): at 10^9+ vectors even the bucketed indexes still ship full float
vectors (512 B at dim 64); PQ compresses each vector to ``m`` one-byte
codes (8 B at the defaults — 64×), which is what makes a whole-corpus
index SMALL enough to broadcast/cache long after raw vectors cannot be.
This is the standard IVF-PQ refine pipeline (Jégou et al., "Product
Quantization for Nearest Neighbor Search"; the reference engine has no
ANN operator — this family is part of the training-data-pipeline scope
the brief adds, like `operators/ann.py`):

  1. OFFLINE FIT (driver, bounded): split dim into ``m`` subspaces, run
     the shared deterministic k-means (``ann._kmeans_fit``) per subspace
     on a ≤ ``sample_cap`` id-ordered sample of NORMALIZED vectors →
     (m × ksub × dim/m) codebooks, broadcast (512 KB at the defaults).
  2. ENCODE (one Arrow-batched ``mapInPandas`` pass): each vector →
     its per-subspace nearest codeword ids (array<smallint> — the
     compressed index).
  3. ADC SCAN (asymmetric distance computation): code blocks are packed
     id-ordered (≤ ``code_block`` codes per row) and joined against
     query-vector blocks; per tile, ONE small GEMM per subspace builds
     each query's (ksub)-entry lookup table and the approximate cosine
     of every (query, code) pair is m table gathers — no decoded
     vectors are ever materialized. Only per-tile top-(refine·k) rows
     survive.
  4. EXACT REFINE: the global ADC shortlist (refine·k per query) is
     re-scored with TRUE vectors (``ann._score_candidates``) and the
     final top-k ranked under the family's shared (cosine desc,
     neighbor asc) order — so every returned SCORE is exact; only
     recall is approximate, and it is pinned by tests
     (recall 1.0 on a codebook-realizable corpus, banded on the
     clustered fixture).

100 TB shape: fit is O(sample · ksub), independent of corpus size;
encode is map-only; the scan shuffles 8-byte codes instead of 512-byte
vectors; refine fetches ``refine·k`` true vectors per query by
id-keyed join. ADC tiles are float32 and bounded by
``block_size × code_block``. Of the two scan variants, only
``ivfpq_ann_topk`` reaches 10^9 vectors (codes are cell-keyed and
SHUFFLED, never broadcast); the flat ``pq_ann_topk`` broadcasts its
code blocks and is therefore bounded by the 8 GB broadcast limit
(~10^8 vectors at m=8) — see its docstring.

``ivfpq_ann_topk`` composes this with the coarse inverted file
(FAISS's IVFPQ): the IVF prunes WHICH members are scored (nprobe cells
per query), PQ prunes WHAT is shipped and scored (codes, not vectors) —
together the scan cost is (cluster_size/nprobe-th of the corpus) ×
(m gathers) per query, and the only full-vector traffic anywhere is the
query side (∝ nprobe) plus the refine fetch (∝ refine·k).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import ann

CODES_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("codes", T.ArrayType(T.ShortType())),
    ]
)


def pq_fit(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 256,
    sample_cap: int = 4096,
    dim: int = 64,
) -> np.ndarray:
    """Fit (m × ksub × dim/m) codebooks on a bounded, deterministic
    driver-side sample of normalized vectors — the offline-fit step of a
    production PQ index (cost ∝ sample, independent of corpus size)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sample = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(sample_cap).collect()
    )
    mat = np.array([r["embedding"] for r in sample], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    dsub = dim // m
    return np.stack(
        [
            ann._kmeans_fit(np.ascontiguousarray(mat[:, i * dsub : (i + 1) * dsub]), ksub)
            for i in range(m)
        ]
    )


def pq_encode(emb: DataFrame, codebooks: np.ndarray) -> DataFrame:
    """Encode every vector to its per-subspace nearest codeword ids —
    one Arrow-batched map-only pass, (vec_id, array<smallint>[m]) out.
    The encoded table IS the index: m bytes of information per vector
    instead of 8·dim (64× at the defaults)."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cbs = bc.value
        mm, _ksub, dsub = cbs.shape
        c2 = (cbs * cbs).sum(axis=2)  # (m, ksub)
        for pdf in it:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            codes = np.empty((len(v), mm), dtype=np.int16)
            for i in range(mm):
                sub = v[:, i * dsub : (i + 1) * dsub]
                # argmin ||x−c||² via the GEMM expansion (x-term constant)
                d2 = c2[i][None, :] - 2.0 * (sub @ cbs[i].T)
                codes[:, i] = d2.argmin(axis=1).astype(np.int16)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "codes": list(codes)}
            )

    return emb.select("vec_id", "embedding").mapInPandas(encode, schema=CODES_SCHEMA)


def _code_blocks(codes: DataFrame, code_block: int) -> DataFrame:
    """Pack (vec_id, codes) rows into id-ordered blocks ≤ code_block —
    the compressed scan unit (one row ≈ m·2·code_block bytes)."""
    members = F.sort_array(
        F.collect_list(F.struct(F.col("vec_id"), F.col("codes")))
    )
    return (
        codes.groupBy(F.floor(F.col("vec_id") / code_block).alias("c_block_id"))
        .agg(members.alias("m"))
        .select(
            "c_block_id",
            F.transform("m", lambda s: s.vec_id).alias("c_ids"),
            F.transform("m", lambda s: s.codes).alias("c_codes"),
        )
    )


def pq_ann_topk(
    emb: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 256,
    refine: int = 4,
    sample_cap: int = 4096,
    dim: int = 64,
    block_size: int = 2048,
    code_block: int = 8192,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC cosine top-k with exact refine (see module docstring).

    Returned scores are EXACT (true-vector re-rank, round-half-away(6),
    (cosine desc, neighbor asc) tiebreak — the family's shared order);
    recall is governed by codebook distortion and the ``refine``
    shortlist factor. Output schema matches ``ann.broadcast_cosine_topk``
    so recall is directly measurable against the exact result.

    Scale scope (r3 ADVICE): this is the FLAT-scan variant — every query
    block scans every code block, with the encoded corpus broadcast to
    avoid a keyless cartesian shuffle. That caps it at corpora whose PQ
    index fits Spark's 8 GB broadcast limit (~10^8 vectors at m=8 —
    plenty for a per-partition/per-shard scan, NOT the module
    docstring's 10^9 figure). At 10^9+ vectors use ``ivfpq_ann_topk``,
    which joins code blocks on their IVF cell id and never broadcasts
    the corpus."""
    spark = emb.sparkSession
    if codebooks is None:
        codebooks = pq_fit(emb, m=m, ksub=ksub, sample_cap=sample_cap, dim=dim)
    bc = spark.sparkContext.broadcast(codebooks.astype(np.float32))
    codes = pq_encode(emb, codebooks)
    cb_blocks = _code_blocks(codes, code_block)
    qb = ann._vec_blocks(emb, block_size, "q_")
    tiles = qb.join(F.broadcast(cb_blocks))
    shortlist_k = max(k * refine, k)
    approx = _adc_scan(tiles, bc, shortlist_k)
    # global ADC shortlist: refine·k per query across code blocks (the
    # "cosine" here is the ADC estimate — internal only, replaced below)
    shortlist = ann._topk(approx, shortlist_k).select("vec_id", "neighbor_id")
    # exact refine: true-vector re-score of the shortlist, final top-k
    return ann._topk(ann._score_candidates(emb, shortlist), k)


def _adc_scan(
    tiles: DataFrame, bc, shortlist_k: int, bc_centroids=None
) -> DataFrame:
    """Shared ADC tile scan: each input row is one (query-block ×
    code-block) tile with aligned (q_ids, q_vecs) / (c_ids, c_codes)
    arrays; one (nq × ksub) GEMM per subspace builds each query's lookup
    tables, the whole (nq × nc) tile is m table gathers, and only the
    per-tile top-``shortlist_k`` (ADC desc, neighbor asc) rows are
    emitted. With ``bc_centroids`` (the residual-IVFPQ form) tile rows
    carry a ``cell`` id and the decomposition q·x ≈ q·centroid(cell) +
    q·decode(residual codes) adds the per-(query, cell) base term before
    ranking — it is what makes shortlists comparable ACROSS cells when
    nprobe > 1. Scores are ADC estimates — internal only, always
    replaced by the exact refine stage."""

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cbs = bc.value  # (m, ksub, dsub) float32
        cents = bc_centroids.value if bc_centroids is not None else None
        mm, _ks, dsub = cbs.shape
        for pdf in it:
            cells = pdf["cell"] if cents is not None else [None] * len(pdf)
            for q_ids, q_vecs, c_ids, c_codes, cell in zip(
                pdf["q_ids"], pdf["q_vecs"], pdf["c_ids"], pdf["c_codes"], cells
            ):
                qi = np.asarray(q_ids, dtype=np.int64)
                ci = np.asarray(c_ids, dtype=np.int64)
                q = np.stack(q_vecs).astype(np.float32)
                q = q / np.linalg.norm(q, axis=1, keepdims=True)
                cc = np.stack([np.asarray(c, dtype=np.int64) for c in c_codes])
                # ADC: one (nq × ksub) GEMM per subspace builds the LUTs,
                # then the whole (nq × nc) tile is m table gathers
                if cents is not None:
                    base = (q @ cents[int(cell)]).astype(np.float32)
                    adc = np.repeat(base[:, None], len(ci), axis=1)
                else:
                    adc = np.zeros((len(qi), len(ci)), dtype=np.float32)
                for i in range(mm):
                    lut = q[:, i * dsub : (i + 1) * dsub] @ cbs[i].T  # (nq, ksub)
                    adc += lut[:, cc[:, i]]
                adc[qi[:, None] == ci[None, :]] = -np.inf  # mask self
                kk = min(shortlist_k, adc.shape[1])
                order = np.lexsort((ci[None, :].repeat(len(qi), 0), -adc), axis=1)
                top = order[:, :kk]
                sc = np.take_along_axis(adc, top, axis=1).ravel()
                keep = sc > -np.inf
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(qi, kk)[keep],
                        "neighbor_id": ci[top].ravel()[keep],
                        "cosine": sc[keep].astype(np.float64),
                    }
                )

    return tiles.mapInPandas(scan, schema=ann.SCORED_SCHEMA)


ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("codes", T.ArrayType(T.ShortType())),
    ]
)


def ivfpq_ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 64,
    nprobe: int = 1,
    m: int = 8,
    ksub: int = 256,
    refine: int = 4,
    sample_cap: int = 4096,
    dim: int = 64,
    sub_blocks: int = 1,
) -> DataFrame:
    """IVF-PQ: the composed production index (coarse inverted file ×
    product-quantized RESIDUAL codes — FAISS's IVFPQ shape). The
    inverted file prunes WHICH vectors are scored (each query visits
    only its ``nprobe`` nearest cells); PQ prunes WHAT is shipped and
    scored (8 int16 codes per member instead of the full vector); codes
    quantize the residual x − centroid(x) — the in-cluster signal —
    and ADC reconstructs q·x as q·centroid + q·decode(residual); the
    exact refine stage re-scores the shortlist with true vectors so
    returned scores are exact and only recall is approximate.

    One fit pass (driver sample → coarse centroids + PQ codebooks, both
    broadcast), one map-only assign+encode pass over the corpus, then
    per-cell ADC tiles exactly like ``pq_ann_topk``'s — queries group by
    probed cell (each query crosses the shuffle nprobe times), members
    ship once as codes. Unlike ``ann.ivf_ann_topk`` there is no phase-2
    completeness bound — this is the recall-tuned variant (recall pinned
    by tests on the clustered fixture), not the certified-exact one.
    ``sub_blocks`` hash-splits giant cells (both the query packs and the
    code packs) so tile memory is bounded by sub-block size, not cell
    size (equality pinned by test). Contract caveat shared with every
    nprobe-bounded index (FAISS returns -1 ids in the same case): a
    query whose probed cells contain no OTHER member emits no rows —
    raise ``nprobe`` when the corpus is skewed enough to have singleton
    cells."""
    spark = emb.sparkSession
    sample = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(sample_cap).collect()
    )
    mat = np.array([r["embedding"] for r in sample], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    centroids = ann._kmeans_fit(mat, n_cells)
    centroids = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    dsub = dim // m
    # RESIDUAL codebooks (the standard IVFPQ recipe): quantize
    # x − centroid(x), not x. The raw vector is dominated by the cluster
    # center, so raw-vector codes collapse within a cell (every member
    # quantizes alike and ADC cannot rank in-cluster neighbors — measured
    # recall 0.02 on the 50k fixture); the residual IS the in-cluster
    # signal, and q·x = q·centroid + q·residual decomposes exactly.
    cell_of = (mat @ centroids.T).argmax(axis=1)
    resid = mat - centroids[cell_of]
    codebooks = np.stack(
        [
            ann._kmeans_fit(
                np.ascontiguousarray(resid[:, i * dsub : (i + 1) * dsub]), ksub
            )
            for i in range(m)
        ]
    )
    bc_cent = spark.sparkContext.broadcast(centroids)
    bc_cb32 = spark.sparkContext.broadcast(codebooks.astype(np.float32))
    bc_cb = spark.sparkContext.broadcast(codebooks)

    def assign_encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents, cbs = bc_cent.value, bc_cb.value
        mm, _ks, ds = cbs.shape
        c2 = (cbs * cbs).sum(axis=2)
        for pdf in it:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            cell = (v @ cents.T).argmax(axis=1).astype(np.int32)
            r = v - cents[cell]
            cds = np.empty((len(v), mm), dtype=np.int16)
            for i in range(mm):
                sub = r[:, i * ds : (i + 1) * ds]
                cds[:, i] = (c2[i][None, :] - 2.0 * (sub @ cbs[i].T)).argmin(
                    axis=1
                ).astype(np.int16)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": cell,
                    "codes": list(cds),
                }
            )

    # single consumer (cell_codes) — no cache: caching here would
    # materialize the whole encoded corpus in the block manager for one
    # read and leak it (never unpersisted) on every invocation
    assigned = emb.select("vec_id", "embedding").mapInPandas(
        assign_encode, schema=ASSIGN_SCHEMA
    )
    # member code blocks per (cell, sub): codes only; sub_blocks > 1
    # hash-splits giant cells so one tile never outgrows a task (the
    # same bound ann._bucket_pack provides for the full-vector tiles)
    members = F.sort_array(F.collect_list(F.struct(F.col("vec_id"), F.col("codes"))))
    ckeys = [F.col("cell")]
    if sub_blocks > 1:
        ckeys.append(
            F.pmod(F.xxhash64("vec_id"), F.lit(sub_blocks)).alias("sub")
        )
    cell_codes = (
        assigned.groupBy(*ckeys)
        .agg(members.alias("m"))
        .select(
            "cell",
            F.transform("m", lambda s: s.vec_id).alias("c_ids"),
            F.transform("m", lambda s: s.codes).alias("c_codes"),
        )
    )

    def probes(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc_cent.value
        npb = min(nprobe, len(cents))
        for pdf in it:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            sims = v @ cents.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :npb]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), npb),
                    "cell": top.ravel().astype(np.int32),
                }
            )

    probe_cells = emb.select("vec_id", "embedding").mapInPandas(
        probes,
        schema=T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("cell", T.IntegerType()),
            ]
        ),
    )
    qb = ann._bucket_pack(
        probe_cells.join(emb.select("vec_id", "embedding"), "vec_id"),
        ["cell"], "vec_id", "q_", sub_blocks,
    )
    shortlist_k = max(k * refine, k)
    bc_cent32 = spark.sparkContext.broadcast(centroids.astype(np.float32))
    approx = _adc_scan(
        qb.join(cell_codes, "cell"), bc_cb32, shortlist_k, bc_centroids=bc_cent32
    )
    shortlist = ann._topk(approx, shortlist_k).select("vec_id", "neighbor_id")
    return ann._topk(ann._score_candidates(emb, shortlist), k)
