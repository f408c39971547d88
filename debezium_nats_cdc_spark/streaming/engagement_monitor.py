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

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.engagement import _WINDOW_DAYS as _WINDOW_DAYS_STATE
from ..operators.engagement import dau_wau, user_days
from ._monitor_base import SwapStateMonitor

_STATE_SCHEMA = "user_id bigint, event_day date, last_epoch bigint"


class EngagementMonitor(SwapStateMonitor):
    """foreachBatch-driven incremental distinct-(user, day) state scored
    by the shared DAU/WAU kernel.  Rows with NULL user or NULL
    event-time are dropped, exactly as the batch operator.  State
    plumbing (exactly-once fold, meta row, epoch guard, start wiring)
    is the shared :class:`SwapStateMonitor` kernel."""

    _STATE_SUBDIR = "engagement_state"
    _QUERY_NAME = "engagement-monitor"
    _STATE_SCHEMA = _STATE_SCHEMA
    _VALUE_COLS = ("user_id", "event_day")
    _META_COL = "event_day"

    def scored(self, spark: SparkSession) -> DataFrame:
        """DAU/WAU/stickiness of everything ingested so far — the
        columns and values of ``events_dau_wau`` over the full ingested
        history."""
        return dau_wau(self.state_rows(spark))

    # -- writes --------------------------------------------------------
    def _batch_rows(self, events: DataFrame) -> DataFrame:
        # cast the configurable user column to the state schema's bigint
        # explicitly (ADVICE r10), mirroring FunnelMonitor._batch_rows —
        # unionByName against the parquet state schema must not depend
        # on the source column's type
        return user_days(events, self.user_col, self.ts_col).select(
            F.col("user_id").cast("bigint").alias("user_id"), "event_day")

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
        self._swap_state(
            spark,
            self.state_rows(spark).filter(F.col("event_day") >= cutoff),
            self.last_epoch(spark))
