"""Streaming observability: capture per-micro-batch progress metrics.

The reference has no monitoring story beyond `.print()` debug sinks
(SURVEY §5); production streams need input-rate / duration / state-size
telemetry per batch. Spark emits exactly this through
``StreamingQueryListener`` — the hook below collects it into plain dicts
(ship them to your metrics sink of choice; a lakehouse table works:
they're just rows).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    """Collects one record per completed micro-batch."""

    def __init__(self) -> None:
        self.records: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.records.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "state_rows": sum(
                    s.numRowsTotal for s in (p.stateOperators or [])
                ),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def attach_progress_collector(spark: SparkSession) -> ProgressCollector:
    """Register a collector on the session's stream manager; detach with
    ``spark.streams.removeListener(collector)`` when done."""
    collector = ProgressCollector()
    spark.streams.addListener(collector)
    return collector
