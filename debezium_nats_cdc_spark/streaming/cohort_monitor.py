"""Streaming cohort-retention monitor (SURVEY §2.D2 — the live twin of
the batch ``events_cohort_retention``; VERDICT r10 task 7).

The reference's "materialized views for real-time aggregations"
(`docs/system-design.md:130-134`) applied to the weekly cohort matrix:
cohort_week x offset_weeks retention kept current as events land,
instead of recomputed from the 5-year history per question
(`docs/system-design.md:330` keeps that history for exactly this
look-back).

State is the distinct (user_id, wk) projection, wk = Monday-truncated
event week — the same EXACT incremental representation as the
engagement monitor's (user, day) frame, for the same reason: the merge
is a distinct union, commutative AND idempotent, so arrival order and
ad-hoc double-folds cannot change it.  Everything the matrix needs
derives from that frame: a user's cohort week is min(wk) over their
rows, each row lands in exactly one (cohort_week, offset) cell, the
offset-0 diagonal is the cohort size.  A late event for an old week
simply adds (or re-adds, a no-op) one row, and the next score
propagates the correction — including a user's cohort week moving DOWN
when a yet-earlier first-activity week arrives, which re-bases every
cell that user touches (pytest-pinned).

Production state bound (:meth:`CohortMonitor.expire_before`): under
the no-late-arrivals contract (no event below watermark W will
arrive), a user whose min wk <= week(W) has a FROZEN cohort — future
events truncate to weeks >= week(W), so the min cannot move.  The
deployment publishes matrix cells whose ACTIVE week (cohort_wk +
7*offset) is >= an oldest-report horizon; a frozen user's rows with
cohort_wk < wk < horizon feed only unpublished cells and are dropped,
while the user's cohort row (wk == min) is kept forever — it carries
the user's cohort assignment and the offset-0 cohort-size diagonal
that every published retained_pct divides by.  State is then bounded
by #users + the horizon's user-week volume; the per-user cohort row is
the information floor for cohort analytics (you must remember every
user's cohort).  Scored output stays EXACTLY equal to the batch
recompute on every published cell and on the whole offset-0 diagonal
(pytest-pinned).

Layout: one swap-written parquet table — (user_id, wk) rows plus a
single ``wk IS NULL`` meta row carrying ``last_epoch`` — the same
atomic state+meta exactly-once contract as the sibling monitors: a
replayed micro-batch compares against last_epoch and no-ops, and the
distinct merge is additionally idempotent.

The scoring mirrors ``operators.funnel.events_cohort_retention``
verbatim from the (user, wk) frame down (the batch query's first step
IS this frame); extracting a shared kernel means touching funnel.py,
which the r11 ODD-phase window cannot absorb (rule A would force its
two queries into a full window) — the consolidation is noted for r12,
and the pytest parity gate pins the two scorings equal after every
batch meanwhile.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .state_backend import LocalFSBackend, StateBackend

_STATE_SCHEMA = "user_id bigint, wk date, last_epoch bigint"


def cohort_matrix(uw: DataFrame) -> DataFrame:
    """The cohort-retention matrix over a distinct (user_id, wk) frame
    — column-for-column the batch ``events_cohort_retention`` output
    (whose first step is exactly this frame).  <= weeks^2 result rows
    at any corpus size; the cohort window runs over <= #weeks rows per
    user, never events."""
    c = uw.withColumn(
        "cohort_wk", F.min("wk").over(W.partitionBy("user_id"))
    )
    m = (
        c.groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort_wk") / 7).cast("int")
             .alias("offset_weeks"),
        )
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    w_cohort = W.partitionBy("cohort_week")
    cohort_size = F.max(
        F.when(F.col("offset_weeks") == 0, F.col("n_active"))
    ).over(w_cohort)
    return m.select(
        "cohort_week", "offset_weeks", "n_active",
        cohort_size.alias("cohort_size"),
        F.round(F.col("n_active").cast("double") / cohort_size, 4)
         .cast("decimal(18,4)").cast("double").alias("retained_pct"),
    )


class CohortMonitor:
    """foreachBatch-driven incremental distinct-(user, week) state
    scored into the cohort-retention matrix.  Rows with NULL user or
    NULL event-time are dropped, exactly as the batch operator; the
    configurable user column is cast to the state schema's bigint
    (the ADVICE-r10 contract the engagement monitor follows)."""

    def __init__(self, root: str, backend: StateBackend | None = None,
                 ts_col: str = "ts", user_col: str = "user_id"):
        self.backend = backend or LocalFSBackend()
        self.state_dir = os.path.join(root, "cohort_state")
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
        """The accumulated distinct (user_id, wk) projection."""
        return (self._state(spark).filter(F.col("wk").isNotNull())
                .select("user_id", "wk"))

    def last_epoch(self, spark: SparkSession) -> int:
        row = (self._state(spark).filter(F.col("wk").isNull())
               .select("last_epoch").first())
        return row.last_epoch if row else -1

    def scored(self, spark: SparkSession) -> DataFrame:
        """The cohort matrix of everything ingested so far — the
        columns and values of ``events_cohort_retention`` over the full
        ingested history (exact until :meth:`expire_before`; after it,
        exact on every published cell and the offset-0 diagonal)."""
        return cohort_matrix(self.state_rows(spark))

    # -- writes --------------------------------------------------------
    def _batch_rows(self, events: DataFrame) -> DataFrame:
        return (
            events
            .filter(F.col(self.user_col).isNotNull()
                    & F.col(self.ts_col).isNotNull())
            .select(
                F.col(self.user_col).cast("bigint").alias("user_id"),
                F.date_trunc("week", F.col(self.ts_col)).cast("date")
                 .alias("wk"),
            )
            .distinct()
        )

    def process_batch(self, spark: SparkSession, events: DataFrame,
                      epoch_id: int | None = None) -> None:
        events = events.localCheckpoint(eager=True)
        if events.isEmpty():
            return
        last = self.last_epoch(spark)
        if epoch_id is not None and epoch_id <= last:
            return  # replayed micro-batch: already folded into state
        merged = (
            self.state_rows(spark)
            .unionByName(self._batch_rows(events))
            .distinct()
            .select("user_id", "wk",
                    F.lit(None).cast("bigint").alias("last_epoch"))
        )
        meta = spark.createDataFrame(
            [(None, None, last if epoch_id is None else epoch_id)],
            _STATE_SCHEMA)
        self.backend.swap_write(
            merged.unionByName(meta).coalesce(1).localCheckpoint(eager=True),
            self.state_dir)

    def expire_before(self, spark: SparkSession, oldest_report_week,
                      watermark_us: int) -> None:
        """Reporting-horizon state bound — module docstring has the
        exactness argument.  Contract: the deployment publishes cells
        whose ACTIVE week is >= ``oldest_report_week`` ('YYYY-MM-DD' or
        date, a Monday), and no event below ``watermark_us`` will ever
        arrive.  Drops (user, wk) rows where the user's cohort is
        frozen (min wk <= week(watermark)), wk < horizon, and wk is
        NOT the user's cohort row; everything a published cell or the
        cohort-size diagonal reads survives."""
        horizon = F.lit(oldest_report_week).cast("date")
        # timestamp_micros keeps the conversion integral (the repo-wide
        # "div 1000, never /1000" microsecond-precision rule)
        wm_week = F.date_trunc(
            "week", F.timestamp_micros(F.lit(int(watermark_us)))
        ).cast("date")
        state = self._state(spark)
        rows = state.filter(F.col("wk").isNotNull())
        cohort = F.min("wk").over(W.partitionBy("user_id"))
        kept = (
            rows.withColumn("_cohort", cohort)
            .filter(
                (F.col("_cohort") > wm_week)        # cohort not frozen
                | (F.col("wk") >= horizon)          # feeds published cells
                | (F.col("wk") == F.col("_cohort"))  # the cohort row
            )
            .select("user_id", "wk",
                    F.lit(None).cast("bigint").alias("last_epoch"))
        )
        meta = spark.createDataFrame(
            [(None, None, self.last_epoch(spark))], _STATE_SCHEMA)
        self.backend.swap_write(
            kept.unionByName(meta).coalesce(1).localCheckpoint(eager=True),
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
                F.when(F.col("wk").isNull(), F.lit(-1).cast("bigint"))
                 .otherwise(F.col("last_epoch"))),
            self.state_dir)

    def start(self, spark: SparkSession, stream: DataFrame,
              available_now: bool = True):
        if not self.backend.checkpoint_established(self.checkpoint_dir):
            self.reset_epoch_guard(spark)
        writer = (
            stream.writeStream.queryName("cohort-monitor")
            .option("checkpointLocation", self.checkpoint_dir)
            .foreachBatch(lambda b, e: self.process_batch(spark, b, e))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
