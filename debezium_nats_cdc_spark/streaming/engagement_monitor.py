"""Streaming engagement monitor (SURVEY §2.D2/H8 — the live twin of the
batch ``events_dau_wau``).

The reference's "materialized views for real-time aggregations"
(`docs/system-design.md:130-134`) applied to the engagement read: DAU /
trailing-week WAU / stickiness kept current as events land, scored by
the exact same kernel (``operators.engagement.dau_wau``) the batch
catalog query runs — the shared-kernel, test-pinned-parity pattern of
the TF-IDF, volume-anomaly and funnel monitors.

State is the distinct (user_id, event_day) projection — the EXACT
incremental representation for distinct-user counts: the per-batch
merge is a distinct union, which is commutative AND idempotent, so any
arrival order and any ad-hoc double-fold produce the same state.  Late
events for an old day simply add (or re-add, a no-op) that day's
(user, day) row, and the next score propagates the correction through
every trailing window the day participates in.  Per-batch cost: the
batch collapses to its own (user, day) rows (one small shuffle), then
one distinct against state.  The state is bounded by Σ_day DAU(day) —
the information floor for exact counts; a production deployment bounds
the horizon with :meth:`EngagementMonitor.expire_before` — days older
than the published reporting window minus the trailing-window width can
no longer affect any published aggregate and are dropped — or moves to
the per-day HLL sketch state of the sibling
``approx_engagement_monitor`` (state <= #days at any user volume)
where approximate WAU is acceptable.

Layout: one swap-written parquet table — (user_id, event_day) rows plus
a single ``event_day IS NULL`` meta row carrying ``last_epoch`` — the
same atomic state+meta exactly-once contract as the sibling monitors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.engagement import _WINDOW_DAYS as _WINDOW_DAYS_STATE
from ..operators.engagement import dau_wau, user_days
from .state_backend import LocalFSBackend, StateBackend

_STATE_SCHEMA = "user_id bigint, event_day date, last_epoch bigint"


class EngagementMonitor:
    """foreachBatch-driven incremental distinct-(user, day) state scored
    by the shared DAU/WAU kernel.  Rows with NULL user or NULL
    event-time are dropped, exactly as the batch operator."""

    def __init__(self, root: str, backend: StateBackend | None = None,
                 ts_col: str = "ts", user_col: str = "user_id"):
        self.backend = backend or LocalFSBackend()
        self.state_dir = os.path.join(root, "engagement_state")
        self.checkpoint_dir = os.path.join(root, "_checkpoints")
        self.ts_col = ts_col
        self.user_col = user_col

    # -- reads ---------------------------------------------------------
    def _state(self, spark: SparkSession) -> DataFrame:
        self.backend.recover(self.state_dir)
        if not self.backend.has_data(self.state_dir):
            return spark.createDataFrame([], _STATE_SCHEMA)
        return spark.read.parquet(self.state_dir)

    def state_rows(self, spark: SparkSession) -> DataFrame:
        """The accumulated distinct (user_id, event_day) projection."""
        return (self._state(spark).filter(F.col("event_day").isNotNull())
                .select("user_id", "event_day"))

    def last_epoch(self, spark: SparkSession) -> int:
        row = (self._state(spark).filter(F.col("event_day").isNull())
               .select("last_epoch").first())
        return row.last_epoch if row else -1

    def scored(self, spark: SparkSession) -> DataFrame:
        """DAU/WAU/stickiness of everything ingested so far — the
        columns and values of ``events_dau_wau`` over the full ingested
        history."""
        return dau_wau(self.state_rows(spark))

    # -- writes --------------------------------------------------------
    def process_batch(self, spark: SparkSession, events: DataFrame,
                      epoch_id: int | None = None) -> None:
        events = events.localCheckpoint(eager=True)
        if events.isEmpty():
            return
        last = self.last_epoch(spark)
        if epoch_id is not None and epoch_id <= last:
            return  # replayed micro-batch: already folded into state
        # cast the configurable user column to the state schema's bigint
        # explicitly (ADVICE r10), mirroring FunnelMonitor._batch_rows —
        # unionByName against the parquet state schema must not depend
        # on the source column's type
        batch_ud = user_days(events, self.user_col, self.ts_col).select(
            F.col("user_id").cast("bigint").alias("user_id"), "event_day")
        merged = (
            self.state_rows(spark)
            .unionByName(batch_ud)
            .distinct()
            .select("user_id", "event_day",
                    F.lit(None).cast("bigint").alias("last_epoch"))
        )
        meta = spark.createDataFrame(
            [(None, None, last if epoch_id is None else epoch_id)],
            _STATE_SCHEMA)
        self.backend.swap_write(
            merged.unionByName(meta).coalesce(1).localCheckpoint(eager=True),
            self.state_dir)

    def expire_before(self, spark: SparkSession, oldest_report_day) -> None:
        """Reporting-horizon state bound — the production cap the module
        docstring promises.  Contract: the deployment only publishes
        days >= ``oldest_report_day`` ('YYYY-MM-DD' or date).  A
        (user, day) row with day < horizon − (window − 1) cannot
        participate in ANY published trailing window, so it is dropped;
        ``scored()`` stays exactly equal to the batch recompute on every
        published day (pytest-pinned).  State becomes bounded by the
        horizon's user-day volume instead of all history."""
        cutoff = F.date_sub(F.lit(oldest_report_day).cast("date"),
                            _WINDOW_DAYS_STATE - 1)
        state = self._state(spark)
        self.backend.swap_write(
            state.filter(F.col("event_day").isNull()
                         | (F.col("event_day") >= cutoff))
            .coalesce(1).localCheckpoint(eager=True),
            self.state_dir)

    def reset_epoch_guard(self, spark: SparkSession) -> None:
        """Clear ``last_epoch`` so a stream restarted from a FRESH
        checkpoint (epoch ids restart at 0) keeps folding into the
        accumulated state — the _ingest_base half-reset contract."""
        state = self._state(spark)
        if state.isEmpty():
            return
        self.backend.swap_write(
            state.withColumn(
                "last_epoch",
                F.when(F.col("event_day").isNull(),
                       F.lit(-1).cast("bigint"))
                 .otherwise(F.col("last_epoch"))),
            self.state_dir)

    def start(self, spark: SparkSession, stream: DataFrame,
              available_now: bool = True):
        if not self.backend.checkpoint_established(self.checkpoint_dir):
            self.reset_epoch_guard(spark)
        writer = (
            stream.writeStream.queryName("engagement-monitor")
            .option("checkpointLocation", self.checkpoint_dir)
            .foreachBatch(lambda b, e: self.process_batch(spark, b, e))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
