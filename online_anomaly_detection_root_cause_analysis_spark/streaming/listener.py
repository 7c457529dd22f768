"""Per-batch lineage + metrics (north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

A StreamingQueryListener appending one JSON line per micro-batch
progress event: batchId, source offsets (the lineage of exactly which
input slice produced which commit), input/processed row counts and
rates, watermark, and state-operator memory — the Spark analog of the
reference's (absent) observability layer.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class LineageMetricsListener(StreamingQueryListener):
    def __init__(self, out_path: str) -> None:
        self.out_path = out_path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "event": "progress",
            "query_id": str(p.id),
            "name": p.name,
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "sources": [
                {
                    "description": s.description,
                    "start_offset": s.startOffset,
                    "end_offset": s.endOffset,
                    "num_input_rows": s.numInputRows,
                }
                for s in p.sources
            ],
            "state_operators": [
                {
                    "operator": so.operatorName,
                    "num_rows_total": so.numRowsTotal,
                    "memory_used_bytes": so.memoryUsedBytes,
                }
                for so in p.stateOperators
            ],
            "watermark": p.eventTime.get("watermark") if p.eventTime else None,
            "duration_ms": dict(p.durationMs) if p.durationMs else {},
        }
        self._write(rec)

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:
        pass

    def _write(self, rec: dict) -> None:
        with self._lock, open(self.out_path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")
