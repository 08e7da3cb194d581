"""StreamingQueryListener-based metrics capture — the K4 surface
(reference: Flink `Histogram` over SummaryStatistics + `Gauge<Double>`,
NexmarkQuery8.java:155-217, registered per-operator). Spark's equivalent is
the listener's QueryProgressEvent stream: per micro-batch input rows,
processing rates, state-store metrics, and any ``observe()``d columns.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCapture(StreamingQueryListener):
    """Collects per-batch progress for assertions / latency accounting."""

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "id": p.id,
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "observedMetrics": {
                    k: v.asDict() if hasattr(v, "asDict") else v
                    for k, v in (p.observedMetrics or {}).items()
                },
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(event.id)

    def total_input_rows(self) -> int:
        return sum(p["numInputRows"] for p in self.progress)
