"""Sketch-state streaming engagement monitor — the approximate tier of
``EngagementMonitor`` (SURVEY §2.D2/H8; the streaming half of VERDICT
r10 #5, promised in OPERATIONS.md §9).

The exact monitor's state is the distinct (user_id, event_day) frame —
the information floor for exact distinct counts, which is also its
cost: state grows with Σ_day DAU(day) (~1e11 rows at the 100 TB
target).  This monitor keeps ONE DataSketches-HLL sketch row per
observed day instead, so state is bounded by ``#days`` regardless of
user volume — the same collapse the batch ``events_dau_wau_approx``
query performs, held incrementally.

Why the merge stays exactly-once-safe at sketch resolution: an HLL
union is an elementwise register MAX, which is commutative,
associative AND idempotent — folding the same events (or the same
sketch) in twice is a no-op, the same algebraic contract the exact
monitors get from their distinct unions.  So arrival order, replays
past the epoch guard, and ad-hoc double-folds all leave state
identical, and a late event for an old day simply maxes into that
day's sketch and propagates through every trailing window the day
feeds.  What is GIVEN UP vs the exact tier is only resolution: scored
counts are ~1.6% rsd estimates (default lgConfigK), inside the 20%
envelope the catalog's approx queries pin 4-sigma deep.

Per-batch cost: the batch collapses map-side to its own per-day
sketches (`hll_sketch_agg`, partial merge — no distinct shuffle), then
a #days-sized union against state.  Scoring explodes the <= #days
SKETCH rows into the <= 7 trailing windows each covers and
`hll_union_agg`-merges per window day — events are never rescanned,
mirroring the batch approx query's estimation plan.

Layout: one swap-written parquet table — (event_day, sk) rows plus a
single ``event_day IS NULL`` meta row carrying ``last_epoch`` — the
same atomic state+meta contract as the sibling monitors.  Reference
parity: the same materialized-view clause as the exact monitor
(`docs/system-design.md:130-134`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.engagement import _WINDOW_DAYS
from .state_backend import LocalFSBackend, StateBackend

_STATE_SCHEMA = "event_day date, sk binary, last_epoch bigint"


class ApproxEngagementMonitor:
    """foreachBatch-driven per-day HLL sketch state scored into
    DAU/WAU/stickiness ESTIMATES.  Rows with NULL user or NULL
    event-time are dropped and the configurable user column is cast to
    bigint, exactly as the exact monitor (the ADVICE-r10 contract)."""

    def __init__(self, root: str, backend: StateBackend | None = None,
                 ts_col: str = "ts", user_col: str = "user_id"):
        self.backend = backend or LocalFSBackend()
        self.state_dir = os.path.join(root, "approx_engagement_state")
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
        """The accumulated (event_day, sk) sketch rows."""
        return (self._state(spark).filter(F.col("event_day").isNotNull())
                .select("event_day", "sk"))

    def last_epoch(self, spark: SparkSession) -> int:
        row = (self._state(spark).filter(F.col("event_day").isNull())
               .select("last_epoch").first())
        return row.last_epoch if row else -1

    def scored(self, spark: SparkSession) -> DataFrame:
        """DAU/WAU/stickiness ESTIMATES per observed day — the batch
        approx query's estimation plan over the persisted sketches:
        explode each day's SKETCH row into the <= 7 trailing windows it
        feeds, union-merge per window day; events are never rescanned."""
        day_sk = self.state_rows(spark)
        days = day_sk.select("event_day")
        expanded = (
            day_sk.select(
                F.explode(F.sequence(F.lit(0), F.lit(_WINDOW_DAYS - 1)))
                 .alias("_k"),
                "event_day", "sk")
            .select(F.date_add("event_day", F.col("_k")).alias("event_day"),
                    "sk")
            .join(days, "event_day", "left_semi")
        )
        wau = (expanded.groupBy("event_day")
               .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                    .cast("bigint").alias("wau_est")))
        dau = day_sk.select(
            "event_day",
            F.hll_sketch_estimate("sk").cast("bigint").alias("dau_est"))
        return (
            dau.join(wau, "event_day")
            .select(
                F.date_format("event_day", "yyyy-MM-dd").alias("event_day"),
                "dau_est", "wau_est",
                F.round(F.col("dau_est").cast("double") / F.col("wau_est"), 4)
                 .cast("decimal(18,4)").cast("double")
                 .alias("stickiness_est"),
            )
        )

    # -- writes --------------------------------------------------------
    def _batch_day_sketches(self, events: DataFrame) -> DataFrame:
        return (
            events
            .filter(F.col(self.user_col).isNotNull()
                    & F.col(self.ts_col).isNotNull())
            .groupBy(F.to_date(self.ts_col).alias("event_day"))
            .agg(F.hll_sketch_agg(
                F.col(self.user_col).cast("bigint")).alias("sk"))
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
            .unionByName(self._batch_day_sketches(events))
            .groupBy("event_day")
            .agg(F.hll_union_agg("sk").alias("sk"))
            .select("event_day", "sk",
                    F.lit(None).cast("bigint").alias("last_epoch"))
        )
        meta = spark.createDataFrame(
            [(None, None, last if epoch_id is None else epoch_id)],
            _STATE_SCHEMA)
        # no lineage break needed: swap_write stages the new generation
        # to a fresh path, so the plan's read of the current state
        # parquet races nothing (BENCHLOG round-12 second cut)
        self.backend.swap_write(
            merged.unionByName(meta).repartition(1), self.state_dir)

    def expire_before(self, spark: SparkSession, oldest_report_day) -> None:
        """Reporting-horizon cap, mirroring the exact monitor: a day
        sketch older than horizon − (window − 1) feeds no published
        trailing window and is dropped.  State is then <= the horizon's
        day count — rows, not user-days."""
        cutoff = F.date_sub(F.lit(oldest_report_day).cast("date"),
                            _WINDOW_DAYS - 1)
        state = self._state(spark)
        self.backend.swap_write(
            state.filter(F.col("event_day").isNull()
                         | (F.col("event_day") >= cutoff))
            .coalesce(1),
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
            stream.writeStream.queryName("approx-engagement-monitor")
            .option("checkpointLocation", self.checkpoint_dir)
            .foreachBatch(lambda b, e: self.process_batch(spark, b, e))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
