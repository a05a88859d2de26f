"""Exactly-once keyed MERGE sink + per-batch lineage manifests.

Reference semantics made streaming-correct:
  * idempotent put (skip-if-exists, ``app.py:146-153``)  → batch-id
    commit log: a batch already committed is skipped on replay, and a
    half-written batch is overwritten at the same deterministic path.
  * dynamic-partition-overwrite gold writes
    (``gold_features_base_job.py:123-139``) → keyed MERGE: the read view
    resolves each key to its latest committed batch (upsert semantics).
  * manifest sidecars (``app.py:164-190``) → one JSON lineage manifest
    per batch: row count, key/event-time ranges, commit timestamp.

Production path at 100 TB is Iceberg ``MERGE INTO`` inside
``foreachBatch`` (snapshot-isolated, ACID); this parquet-backed sink
reproduces the same contract — idempotent replay, keyed upsert,
read-your-commits — on a plain filesystem so the engine and its tests
run anywhere. The write layout is LSM-ish: immutable per-batch parquet
deltas + a commit log; the reader compacts keys with keep-latest-batch.
A real deployment swaps ``ParquetMergeSink`` for an Iceberg writer
without touching query code (same ``foreach_batch_handler`` signature).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ParquetMergeSink:
    """foreachBatch target implementing exactly-once keyed upsert."""

    def __init__(self, table_dir: str, keys: Sequence[str], event_time_col: str | None = None):
        self.table_dir = table_dir
        self.keys = list(keys)
        self.event_time_col = event_time_col
        self.data_dir = os.path.join(table_dir, "data")
        self.commits_dir = os.path.join(table_dir, "_commits")
        self.manifests_dir = os.path.join(table_dir, "_manifests")
        for d in (self.data_dir, self.commits_dir, self.manifests_dir):
            os.makedirs(d, exist_ok=True)

    # -- write path ---------------------------------------------------------

    def _commit_marker(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"batch-{batch_id:08d}.json")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_marker(batch_id))

    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        """The ``foreachBatch`` handler. Idempotent: replaying a committed
        batch is a no-op; a torn write is overwritten at the same path."""
        if self.is_committed(batch_id):
            return
        out = os.path.join(self.data_dir, f"batch-{batch_id:08d}")
        df = df.withColumn("__batch_id", F.lit(batch_id))
        df.write.mode("overwrite").parquet(out)

        # lineage manifest (reference manifest-sidecar analog) — stats come
        # from parquet FOOTER metadata (row counts + column min/max), a
        # metadata-only pass: no second Spark job over the written data
        stats = self._footer_stats(out)
        manifest = {
            "batch_id": batch_id,
            "path": out,
            "keys": self.keys,
            "stats": stats,
            "committed_at_unix": time.time(),
        }
        with open(os.path.join(self.manifests_dir, f"batch-{batch_id:08d}.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        # atomic-ish commit marker LAST: presence == batch fully durable
        tmp = self._commit_marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "rows": stats["rows"]}, f)
        os.rename(tmp, self._commit_marker(batch_id))

    def _footer_stats(self, out_dir: str) -> dict:
        import glob as _glob

        import pyarrow.parquet as _pq

        tracked = list(self.keys) + (
            [self.event_time_col] if self.event_time_col else []
        )
        rows = 0
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for f in _glob.glob(os.path.join(out_dir, "*.parquet")):
            md = _pq.ParquetFile(f).metadata
            rows += md.num_rows
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for i, name in enumerate(names):
                    if name not in tracked:
                        continue
                    st = g.column(i).statistics
                    if st is None or not st.has_min_max:
                        continue
                    if name not in mins or st.min < mins[name]:
                        mins[name] = st.min
                    if name not in maxs or st.max > maxs[name]:
                        maxs[name] = st.max
        stats = {"rows": str(rows)}
        for c in tracked:
            stats[f"min_{c}"] = str(mins.get(c))
            stats[f"max_{c}"] = str(maxs.get(c))
        return stats

    def foreach_batch_handler(self):
        return lambda df, bid: self.process_batch(df, bid)

    # -- read path ----------------------------------------------------------

    def committed_batches(self) -> list[int]:
        return sorted(
            int(f[len("batch-") : -len(".json")])
            for f in os.listdir(self.commits_dir)
            if f.startswith("batch-") and f.endswith(".json")
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """Merged view: latest committed version of every key (upsert)."""
        batches = self.committed_batches()
        if not batches:
            raise FileNotFoundError(f"no committed batches in {self.table_dir}")
        paths = [os.path.join(self.data_dir, f"batch-{b:08d}") for b in batches]
        df = spark.read.parquet(*paths)
        w = Window.partitionBy(*self.keys).orderBy(F.desc("__batch_id"))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__batch_id")
        )

    def manifests(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.manifests_dir)):
            with open(os.path.join(self.manifests_dir, f)) as fh:
                out.append(json.load(fh))
        return out


class AdditiveSummarySink(ParquetMergeSink):
    """Mergeable-SKETCH sink: per-batch deltas are Misra-Gries token
    summaries (``operators/heavy_hitters.mg_batch_summary``) and the read
    view merges them by POINTWISE ADDITION per token — not keyed
    latest-wins. An additive merge is NOT idempotent under replay (a
    re-applied batch would double-count), so the batch-id commit log is
    what makes the running count exactly-once; this sink exists to
    demonstrate exactly that contract for sketch maintenance.

    State is bounded: each delta holds ≤ partitions·k token rows + the
    decrement bookkeeping sentinels; the merged view reports every
    surviving token with its certified bound
    (true count ∈ [count, count + max_undercount])."""

    def __init__(self, table_dir: str):
        super().__init__(table_dir, keys=["token"], event_time_col=None)

    def read(self, spark: SparkSession) -> DataFrame:
        from ..operators.heavy_hitters import _SENTINEL

        batches = self.committed_batches()
        if not batches:
            raise FileNotFoundError(f"no committed batches in {self.table_dir}")
        paths = [os.path.join(self.data_dir, f"batch-{b:08d}") for b in batches]
        df = spark.read.parquet(*paths)
        merged = df.groupBy("token").agg(
            F.sum("count").alias("count"), F.sum("decrement").alias("dec")
        )
        bound = merged.agg(
            F.coalesce(F.sum("dec"), F.lit(0)).alias("max_undercount")
        )
        return (
            merged.filter(F.col("token") != F.lit(_SENTINEL))
            .select("token", "count")
            .crossJoin(F.broadcast(bound))
        )
