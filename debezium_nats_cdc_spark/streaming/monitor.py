"""Stream monitoring (SURVEY §2.H2/H8, D3).

Reference SLOs: CDC lag < 1 s (alert > 10 s), processing-rate drop > 50%
alert, DLQ depth (docs/system-design.md:326,395-401); counters
events.published.total / events.failed.total by type
(docs/design.md:588-596).

Engine mapping: ``observe()`` named metrics ride each micro-batch for
free (no extra pass — they're accumulated during the batch's own scan);
a StreamingQueryListener surfaces them + progress, and lag is
(wall clock - max event_time) at batch completion.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQueryListener


def with_lag_metrics(unwrapped: DataFrame, name: str = "cdc_metrics") -> DataFrame:
    """Attach observed metrics: event count + max event time (for lag)."""
    return unwrapped.observe(
        name,
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts_ms").alias("max_ts_ms"),
        F.sum(F.when(F.col("is_tombstone"), 1).otherwise(0)).alias("n_tombstones"),
    )


@dataclass
class HealthState:
    """Rolling stream-health snapshot (H8 thresholds)."""

    lag_alert_ms: int = 10_000          # docs/system-design.md:396
    rate_drop_alert: float = 0.5        # docs/system-design.md:397
    last_rate: float | None = None
    alerts: list[str] = field(default_factory=list)
    history: list[dict] = field(default_factory=list)

    def record(self, batch_metrics: dict, rows_per_sec: float | None) -> None:
        now_ms = int(time.time() * 1000)
        max_ts = batch_metrics.get("max_ts_ms")
        lag_ms = (now_ms - max_ts) if max_ts is not None else None
        snap = {"ts": now_ms, "lag_ms": lag_ms, "rate": rows_per_sec, **batch_metrics}
        self.history.append(snap)
        if lag_ms is not None and lag_ms > self.lag_alert_ms:
            self.alerts.append(f"cdc_lag {lag_ms}ms > {self.lag_alert_ms}ms")
        if (
            rows_per_sec is not None
            and self.last_rate
            and rows_per_sec < self.last_rate * (1 - self.rate_drop_alert)
        ):
            self.alerts.append(
                f"processing rate drop {self.last_rate:.0f}->{rows_per_sec:.0f}/s"
            )
        if rows_per_sec:
            self.last_rate = rows_per_sec


class CdcHealthListener(StreamingQueryListener):
    """Collects observed metrics per micro-batch; alert log per H8.

    NB: lag here measures against fixture event-times in tests (historic
    timestamps => huge lag); production semantics need live sources.
    """

    def __init__(self, metric_name: str = "cdc_metrics") -> None:
        self.metric_name = metric_name
        self.state = HealthState()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        obs = (p.observedMetrics or {}).get(self.metric_name)
        metrics = obs.asDict() if obs is not None else {}
        self.state.record(metrics, p.processedRowsPerSecond)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def dlq_depth(spark, dead_letter_dir: str) -> int:
    """DLQ depth gauge (docs/system-design.md:400).

    mergeSchema: DLQ rows grew a ``schema_version`` column in r5, so a
    dead-letter dir appended across engine versions holds mixed-schema
    parquet; without the option the resolved schema depends on which
    file Spark samples and the new column can silently vanish.
    """
    try:
        return (
            spark.read.option("mergeSchema", "true")
            .parquet(dead_letter_dir)
            .count()
        )
    except Exception:
        return 0


def read_dlq(spark, dead_letter_dir: str):
    """Read the dead-letter log across engine versions.

    The canonical DLQ reader for tooling: always mergeSchema (the r5
    ``schema_version`` column bump means pre-r5 files lack it — merged
    reads surface it as NULL for old rows instead of dropping it), the
    same discipline as the state-log reads in streaming/pipeline.py.
    """
    return spark.read.option("mergeSchema", "true").parquet(dead_letter_dir)
