"""Per-conversation rolling features on the Spark 4 ``transformWithState``
API (``transformWithStateInPandas``) — the second backend of the stateful
operator in ``stateful.py``.

Same semantics, same pure core (``stateful._step``): buffered turns are
emitted in strict (ts, turn_idx) order once the watermark passes their
event time, so output is bit-equal to the batch
``plans/gold_features.conv_features`` plan and to the
``applyInPandasWithState`` backend. What differs is the state plumbing:

  * typed, named state variables (one ``ValueState`` per aggregate
    group, one ``ListState`` for the turn buffer) instead of a single
    monolithic state tuple — the TWS model; only touched variables are
    re-serialized per batch, which at 10^12-turn scale means the O(1)
    aggregates don't pay for the O(n) buffer on quiet batches;
  * first-class event-time timers (``registerTimer`` /
    ``handleExpiredTimer``) instead of one timeout slot — eviction and
    buffered-emission wakeups are separate timers;
  * requires the RocksDB state store provider (enforced by Spark).

Availability: the TWS Python↔JVM state protocol is protobuf-based
(``pyspark/sql/streaming/proto/StateMessage_pb2``); on installs without
``protobuf`` (this container ships pyspark without it) the driver worker
crashes at init, so ``tws_available()`` gates every use and the
equivalence test skips. The ``applyInPandasWithState`` backend in
``stateful.py`` carries the same semantics everywhere.

Reference parity: same per-entity ordered feature semantics as
``gold_ml_training_job.py:57-109`` (W5-W9), streaming form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .stateful import _EMPTY, _rows_to_pdf, _step, GAP_S_DEFAULT, OUTPUT_SCHEMA


# default google-cloud-sdk bundle location; override with
# $SPARK_GRAFT_PB_SDK_PATH on hosts that stage the SDK elsewhere
_PB_SDK_PATH = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _sdk_path() -> str:
    import os

    return os.environ.get("SPARK_GRAFT_PB_SDK_PATH", _PB_SDK_PATH)


def tws_available() -> bool:
    """True when the transformWithState protobuf protocol can load.

    Fallback: when no ``protobuf`` wheel is installed but the
    google-cloud-sdk bundle ships its pure-python runtime (6.32), use it
    — appending to ``sys.path`` driver-side and exporting a
    ``sitecustomize`` shim dir on PYTHONPATH so Python WORKERS patch
    themselves at interpreter startup (the TWS state server runs in the
    worker). The 6.32-runtime/6.33-gencode skew is wire-compatible for
    this proto; protobuf's strict version gate is no-op'd and the TWS
    e2e equivalence test is the actual compatibility proof. Must run
    BEFORE the SparkSession launches (the JVM snapshots the env).

    Scoping (so the shim can't break other protobuf consumers in the
    process): only NAMESPACE-package ``google.*`` module entries — the
    empty artifacts of spark-core.jar's shaded class dirs — are purged
    from ``sys.modules``; modules imported from a real installation (they
    have ``__file__``) are left untouched. The version gate is no-op'd
    only after confirming ``runtime_version`` actually resolved from the
    SDK bundle — if it came from a real protobuf install, its gate stays
    intact (and is the correct one to enforce)."""
    import os
    import sys

    def _has_real_protobuf() -> bool:
        # Spark workers carry spark-core.jar on sys.path; its shaded
        # google/protobuf class dirs import as an EMPTY namespace package,
        # so probe for actual content, not import success
        try:
            from google.protobuf import descriptor  # noqa: F401

            return True
        except ImportError:
            return False

    if not _has_real_protobuf():
        sdk = _sdk_path()
        if not os.path.isdir(sdk):
            return False
        sys.path.append(sdk)
        # purge ONLY namespace-package artifacts (no __file__): these are
        # the shaded-jar decoys blocking the SDK import; anything with a
        # real file came from an actual installation and stays cached
        for m in [
            m
            for m in sys.modules
            if (m == "google" or m.startswith("google."))
            and getattr(sys.modules[m], "__file__", None) is None
        ]:
            del sys.modules[m]
        try:
            from google.protobuf import runtime_version as _rv
        except ImportError:
            return False
        # no-op the strict version gate ONLY for the SDK-bundle runtime we
        # just wired in — never for a real protobuf installation
        if (getattr(_rv, "__file__", "") or "").startswith(sdk):
            _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        shim_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_pb_shim")
        if shim_dir not in os.environ.get("PYTHONPATH", ""):
            parts = [shim_dir, os.environ.get("PYTHONPATH", "")]
            os.environ["PYTHONPATH"] = ":".join(p for p in parts if p)
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False

# buffer rows: one per not-yet-emitted turn
_BUF_SCHEMA = "turn_idx int, ts_us long, has_tool boolean"
# emission-ordered inter-turn gaps (backs the expanding exact percentiles)
_GAPS_SCHEMA = "gap_us double"
# event times inside the trailing 10-min window
_RECENT_SCHEMA = "ts_us long"
# turn_idx values already emitted (exact-dedup set)
_EMITTED_SCHEMA = "turn_idx int"
# O(1) running aggregates
_AGG_SCHEMA = (
    "emitted_count long, emitted_tool long, max_turn_idx int, "
    "last_ts_us long, session_id int, session_start_us long"
)


class ConvFeaturesProcessor(StatefulProcessor):
    """TWS processor wrapping ``stateful._step``."""

    def __init__(self, gap_s: int = GAP_S_DEFAULT):
        self.gap_s = gap_s

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.buf = handle.getListState("buf", _BUF_SCHEMA)
        self.gaps = handle.getListState("gaps", _GAPS_SCHEMA)
        self.recent = handle.getListState("recent", _RECENT_SCHEMA)
        self.emitted = handle.getListState("emitted", _EMITTED_SCHEMA)
        self.agg = handle.getValueState("agg", _AGG_SCHEMA)

    # -- state (de)serialization to/from the shared 12-field tuple ---------

    def _load(self) -> tuple:
        if not self.agg.exists():
            return _EMPTY
        e_count, e_tool, max_ti, last_ts, sess_id, sess_start = self.agg.get()
        buf = list(self.buf.get())
        return (
            [b[0] for b in buf],
            [b[1] for b in buf],
            [b[2] for b in buf],
            [r[0] for r in self.emitted.get()],
            [r[0] for r in self.gaps.get()],
            [r[0] for r in self.recent.get()],
            e_count, e_tool, max_ti, last_ts, sess_id, sess_start,
        )

    def _store(self, st: tuple, timer_ms: int, timer_values) -> None:
        (
            buf_ti, buf_ts, buf_tool, emitted, gaps, recent,
            e_count, e_tool, max_ti, last_ts, sess_id, sess_start,
        ) = st
        # TWS list state rejects empty puts — clear() is the empty write
        def put_list(state, rows: list) -> None:
            state.put(rows) if rows else state.clear()

        put_list(self.buf, list(zip(buf_ti, buf_ts, buf_tool)))
        put_list(self.gaps, [(g,) for g in gaps])
        put_list(self.recent, [(r,) for r in recent])
        put_list(self.emitted, [(t,) for t in emitted])
        self.agg.update((e_count, e_tool, max_ti, last_ts, sess_id, sess_start))
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(timer_ms)

    def _clear(self) -> None:
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        for s in (self.buf, self.gaps, self.recent, self.emitted):
            s.clear()
        self.agg.clear()

    def _run(self, key, pdf_iter, timer_values) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        wm_us = timer_values.getCurrentWatermarkInMs() * 1000
        out_rows, new_state, timer = _step(
            conv_id, pdf_iter, self._load(), wm_us, self.gap_s
        )
        if new_state is not None:
            self._store(new_state, timer, timer_values)
        else:
            self._clear()
        if out_rows:
            yield _rows_to_pdf(out_rows)

    # -- TWS hooks ----------------------------------------------------------

    def handleInputRows(self, key, rows, timerValues):
        return self._run(key, rows, timerValues)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return self._run(key, iter(()), timerValues)

    def close(self) -> None:
        pass


def conv_features_stream_tws(
    silver_stream: DataFrame, gap_s: int = GAP_S_DEFAULT
) -> DataFrame:
    """TWS twin of ``stateful.conv_features_stream``. Requires the RocksDB
    state store provider (set ``spark.sql.streaming.stateStore
    .providerClass`` before starting the query)."""
    return (
        silver_stream.select("conv_id", "turn_idx", "tool", "ts")
        .groupBy("conv_id")
        .transformWithStateInPandas(
            ConvFeaturesProcessor(gap_s),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
