"""StreamingQueryListener metrics: the observability contract.

Reference analog: CloudWatch metrics + SNS failure alerts + manifest
accounting (``terraform/sns_failed.tf:1-44``, ``app.py:164-190``,
``--enable-metrics`` in ``terraform/silver_glue_job.tf:28``). Here every
micro-batch progress event is captured in-memory and (optionally)
appended to a JSONL log: input rows, process rates, batch duration,
watermark, state-store rows — the numbers the benchmark protocol reports
(turns/sec sustained, p99 batch latency, scaling efficiency).
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    def __init__(self, jsonl_path: str | None = None):
        self.progress: list[dict] = []
        self.terminated: list[dict] = []
        self.jsonl_path = jsonl_path
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        rec = {
            "id": p.get("id"),
            "name": p.get("name"),
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows", 0),
            "inputRowsPerSecond": p.get("inputRowsPerSecond"),
            "processedRowsPerSecond": p.get("processedRowsPerSecond"),
            "durationMs": p.get("durationMs", {}),
            "eventTime": p.get("eventTime", {}),
            "stateOperators": [
                {
                    "operatorName": s.get("operatorName"),
                    "numRowsTotal": s.get("numRowsTotal"),
                    "numRowsUpdated": s.get("numRowsUpdated"),
                    "numRowsDroppedByWatermark": s.get("numRowsDroppedByWatermark"),
                }
                for s in p.get("stateOperators", [])
            ],
        }
        with self._lock:
            self.progress.append(rec)
            if self.jsonl_path:
                with open(self.jsonl_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self.terminated.append({"id": str(event.id), "exception": event.exception})

    # -- benchmark accessors -------------------------------------------------

    def total_input_rows(self, name: str | None = None) -> int:
        return sum(
            p["numInputRows"]
            for p in self.progress
            if name is None or p.get("name") == name
        )

    def batch_durations_ms(self, name: str | None = None) -> list[float]:
        return [
            p["durationMs"].get("triggerExecution", 0)
            for p in self.progress
            if (name is None or p.get("name") == name) and p.get("numInputRows", 0) > 0
        ]

    def rows_dropped_by_watermark(self) -> int:
        return sum(
            s.get("numRowsDroppedByWatermark") or 0
            for p in self.progress
            for s in p["stateOperators"]
        )
