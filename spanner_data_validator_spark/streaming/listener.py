"""StreamingQueryListener metrics — the ops surface the reference exposes via
Beam ``Metrics.gauge`` per classification (JDBCToSpannerDVTWithHash.java:433-438),
re-expressed on Spark's listener API, plus per-partition lineage logging."""

from __future__ import annotations

import json
import logging
import os
import time

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("sdv.streaming")


class ValidationMetricsListener(StreamingQueryListener):
    """Collects per-micro-batch progress: rows/sec, state-store rows, watermark.

    ``snapshots`` accumulates dicts (one per progress event) that tests and
    the bench harness introspect; ``dump(path)`` persists the run's lineage —
    which micro-batch consumed which source offsets (the file-source analogue
    of per-partition lineage) — as JSON lines.
    """

    def __init__(self):
        self.snapshots: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event):
        self.started.append(str(event.id))

    def onQueryProgress(self, event):
        p = event.progress
        try:
            raw = json.loads(p.json)
        except Exception:  # pragma: no cover - defensive
            raw = {}
        snap = {
            "wall_ts": time.time(),
            "batch_id": raw.get("batchId"),
            "num_input_rows": raw.get("numInputRows"),
            "input_rows_per_second": raw.get("inputRowsPerSecond"),
            "processed_rows_per_second": raw.get("processedRowsPerSecond"),
            "watermark": (raw.get("eventTime") or {}).get("watermark"),
            "state_rows": [
                s.get("numRowsTotal") for s in raw.get("stateOperators", [])
            ],
            "sources": [
                {
                    "description": s.get("description"),
                    "start_offset": s.get("startOffset"),
                    "end_offset": s.get("endOffset"),
                    "num_input_rows": s.get("numInputRows"),
                }
                for s in raw.get("sources", [])
            ],
        }
        self.snapshots.append(snap)
        log.info("progress batch=%s rows=%s", snap["batch_id"], snap["num_input_rows"])

    def onQueryTerminated(self, event):
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event):  # Spark 3.4+
        pass

    # ---- reporting --------------------------------------------------------
    def total_input_rows(self) -> int:
        return sum(s["num_input_rows"] or 0 for s in self.snapshots)

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            for s in self.snapshots:
                f.write(json.dumps(s) + "\n")
