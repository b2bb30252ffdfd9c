"""T8: backpressure / lag monitoring via StreamingQueryListener.

Reference: src/utils/monitoring.py:105-110,227-243 exposes a consumer-lag
gauge with an alert threshold (>1000 msgs, config/config.yaml:229). The
Spark-native analog is query-progress telemetry: rows per trigger,
processing rate, and batch duration from the listener callbacks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    query_id: str
    batch_id: int
    num_input_rows: int
    processed_rows_per_second: float
    duration_ms: int


@dataclass
class ProgressMonitor(StreamingQueryListener):
    """Collects per-trigger progress; flags triggers whose input exceeds
    ``lag_alert_rows`` (the reference's consumer-lag alert analog)."""

    lag_alert_rows: int = 1000
    progress: list[BatchProgress] = field(default_factory=list)
    alerts: list[BatchProgress] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = BatchProgress(
            query_id=str(p.id),
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            processed_rows_per_second=p.processedRowsPerSecond or 0.0,
            duration_ms=int(p.durationMs.get("triggerExecution", 0)),
        )
        self.progress.append(rec)
        if rec.num_input_rows > self.lag_alert_rows:
            self.alerts.append(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
