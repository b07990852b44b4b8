"""K7/A4: audit counters (reference msg.log appends — producer.py:95-97,
topic_consumer.py:286-289 — and the per-run reconciliation identity
messages == inserts + skips, Project 4.pdf p7).

Batch plans get counters for free from validate_with_audit's Observation;
streaming queries surface the same numbers via a StreamingQueryListener
(lastProgress.observedMetrics) without a second pass over the data."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class AuditLogListener(StreamingQueryListener):
    """Appends one JSON line per micro-batch progress event: rows in/out
    plus any observe() metrics attached to the plan — the streaming twin
    of the reference's 'N messages consumed / inserted' log lines."""

    def __init__(self, log_path: str):
        self.log_path = log_path

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "observed": dict(p.observedMetrics.get("validation").asDict())
                if "validation" in p.observedMetrics
                else {},
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:
        pass

    def _write(self, record: dict) -> None:
        record["ts"] = datetime.now(timezone.utc).isoformat()
        with open(self.log_path, "a") as f:
            f.write(json.dumps(record) + "\n")


def register_audit_log(spark: SparkSession, log_path: str) -> AuditLogListener:
    listener = AuditLogListener(log_path)
    spark.streams.addListener(listener)
    return listener
