"""Shared kernel for the swap-state user-keyed monitors (VERDICT r11
task 5 — the ``_ingest_base.py`` precedent applied to the funnel /
engagement / cohort family).

All three monitors share the same state discipline, previously
re-implemented per module (the drift risk this consolidation removes):

  * ONE swap-written parquet table per monitor: value rows plus a
    single meta row (the meta discriminator column IS NULL) carrying
    ``last_epoch`` — atomic state+meta, so there is no window where the
    rows reflect an epoch the meta does not;
  * exactly-once fold: a replayed micro-batch compares its epoch id
    against ``last_epoch`` and no-ops; the distinct merge is
    additionally idempotent, so even an ad-hoc double-fold cannot
    corrupt the state;
  * fresh-checkpoint half-reset (``reset_epoch_guard``): a stream
    restarted from a NEW checkpoint (epoch ids restart at 0) keeps
    folding into the accumulated state;
  * ``start``: foreachBatch wiring with the checkpoint-established
    guard.

Subclasses define the state shape (``_STATE_SCHEMA`` /
``_VALUE_COLS`` / ``_META_COL``), the per-batch projection
(``_batch_rows``) and the scoring; the funnel monitor additionally
overrides ``_post_merge`` with its dominance pruning.  The
monitor-specific state bounds (``compact`` / ``expire_before``) stay in
the subclasses — their exactness arguments are monitor-specific — but
write back through the shared ``_swap_state``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .state_backend import LocalFSBackend, StateBackend


class SwapStateMonitor:
    """State plumbing shared by the user-keyed monitors.  Class
    attributes each subclass pins:

    ``_STATE_SUBDIR``  state directory name under the monitor root
    ``_QUERY_NAME``    writeStream queryName
    ``_STATE_SCHEMA``  DDL of value columns + trailing ``last_epoch``
    ``_VALUE_COLS``    the value column names (no ``last_epoch``)
    ``_META_COL``      value column whose NULL marks the meta row
    """

    _STATE_SUBDIR: str
    _QUERY_NAME: str
    _STATE_SCHEMA: str
    _VALUE_COLS: tuple[str, ...]
    _META_COL: str

    def __init__(self, root: str, backend: StateBackend | None = None,
                 ts_col: str = "ts", user_col: str = "user_id"):
        self.backend = backend or LocalFSBackend()
        self.state_dir = os.path.join(root, self._STATE_SUBDIR)
        self.checkpoint_dir = os.path.join(root, "_checkpoints")
        self.ts_col = ts_col
        self.user_col = user_col
        # single-writer epoch memo: every state mutation goes through
        # this instance (_swap_state / reset_epoch_guard), so after the
        # first read the guard needs no per-batch Spark job over the
        # state parquet — a measured ~1-2 s of pure scheduling per
        # micro-batch (BENCHLOG round-12).  A fresh instance (restart,
        # concurrent reader) starts cold and reads the state file, the
        # single source of truth.
        self._epoch_memo: int | None = None

    # -- reads ---------------------------------------------------------
    def _state(self, spark: SparkSession) -> DataFrame:
        self.backend.recover(self.state_dir)
        if not self.backend.has_data(self.state_dir):
            return spark.createDataFrame([], self._STATE_SCHEMA)
        return spark.read.parquet(self.state_dir)

    def state_rows(self, spark: SparkSession) -> DataFrame:
        """The accumulated value rows (meta row excluded)."""
        return (self._state(spark)
                .filter(F.col(self._META_COL).isNotNull())
                .select(*self._VALUE_COLS))

    def last_epoch(self, spark: SparkSession) -> int:
        if self._epoch_memo is not None:
            return self._epoch_memo
        self.backend.recover(self.state_dir)
        if not self.backend.has_data(self.state_dir):
            # fresh monitor: no state table yet, so skip the Spark job
            # entirely — a .first() even on the EMPTY substitute frame
            # costs ~0.8-1.1 s of pure job machinery (measured r13,
            # BENCHLOG), which every cold start and all three
            # monitor_*_publish queries paid; -1 is exactly what the
            # missing meta row means, and memoizing it is sound under
            # the same single-writer contract as the epoch memo itself
            self._epoch_memo = -1
            return self._epoch_memo
        # recover()/has_data() already ran above — read the parquet
        # directly rather than repeating both through _state()
        row = (spark.read.parquet(self.state_dir)
               .filter(F.col(self._META_COL).isNull())
               .select("last_epoch").first())
        self._epoch_memo = row.last_epoch if row else -1
        return self._epoch_memo

    # -- subclass hooks --------------------------------------------------
    def _batch_rows(self, events: DataFrame) -> DataFrame:
        """One micro-batch projected to the state's value columns."""
        raise NotImplementedError

    def _post_merge(self, merged: DataFrame) -> DataFrame:
        """Hook between the distinct merge and the state write (the
        funnel monitor's dominance pruning; identity elsewhere)."""
        return merged

    # -- writes ----------------------------------------------------------
    def _swap_state(self, spark: SparkSession, rows: DataFrame,
                    epoch: int) -> None:
        """Atomically replace the state with ``rows`` + a meta row
        carrying ``epoch`` — the one write path every state mutation
        (fold, compaction, expiry) goes through."""
        kept = rows.select(
            *self._VALUE_COLS,
            F.lit(None).cast("bigint").alias("last_epoch"))
        meta = spark.createDataFrame(
            [tuple([None] * len(self._VALUE_COLS)) + (epoch,)],
            self._STATE_SCHEMA)
        # repartition(1), NOT coalesce(1): coalescing a union of a
        # shuffle branch and the meta LocalRelation measured ~4.7 s per
        # micro-batch vs ~0.6 s with an explicit 1-partition shuffle —
        # same single state file either way (BENCHLOG round-12).
        # No lineage break before the write: every backend stages the
        # new generation to a FRESH path (LocalFS ``.staging`` dir /
        # a new generation dir) before atomically installing it, so the
        # plan's read of the current state parquet races nothing — the
        # eager localCheckpoint this replaced was a full extra
        # materialization pass per micro-batch (~0.4 s, BENCHLOG
        # round-12; ``reset_epoch_guard`` below always worked this way)
        self.backend.swap_write(
            kept.unionByName(meta).repartition(1), self.state_dir)
        self._epoch_memo = epoch

    #: whether the fold needs an explicit distinct between the union and
    #: ``_post_merge`` — monitors whose ``_post_merge`` already collapses
    #: duplicates (the funnel's per-user collect_set) opt out, saving a
    #: full exchange per fold (guide §2.4: two operations keyed the same
    #: way share one exchange)
    _MERGE_DISTINCT = True

    def process_batch(self, spark: SparkSession, events: DataFrame,
                      epoch_id: int | None = None) -> None:
        # LAZY checkpoint: the batch is consumed at most twice (the
        # emptiness probe's limit-1 scan, then the merge's full pass,
        # which materializes the cache as it goes) — the eager form
        # paid a dedicated full materialization job per fold before
        # either consumer ran (~0.15 s of pure scheduling at sf0.1)
        events = events.localCheckpoint(eager=False)
        if events.isEmpty():
            return
        last = self.last_epoch(spark)
        if epoch_id is not None and epoch_id <= last:
            return  # replayed micro-batch: already folded into state
        merged = self.state_rows(spark).unionByName(self._batch_rows(events))
        if self._MERGE_DISTINCT:
            merged = merged.distinct()
        self._swap_state(spark, self._post_merge(merged),
                         last if epoch_id is None else epoch_id)

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
                F.when(F.col(self._META_COL).isNull(),
                       F.lit(-1).cast("bigint"))
                 .otherwise(F.col("last_epoch"))),
            self.state_dir)
        self._epoch_memo = -1

    def start(self, spark: SparkSession, stream: DataFrame,
              available_now: bool = True):
        if not self.backend.checkpoint_established(self.checkpoint_dir):
            self.reset_epoch_guard(spark)
        writer = (
            stream.writeStream.queryName(self._QUERY_NAME)
            .option("checkpointLocation", self.checkpoint_dir)
            .foreachBatch(lambda b, e: self.process_batch(spark, b, e))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
