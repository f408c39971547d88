"""CDC materialization — latest-state-per-key (SURVEY.md §2.H1/E2).

THE semantic heart of CDC: apply a c/u/d/r change stream to maintain the
queryable current state of each source table (reference op semantics
docs/cdc-guide.md:137-149; event-sourcing goal docs/system-design.md:718).

Batch form: one window (partition by pk, order by event-time desc) —
a single hash shuffle on the key, no global sort, linear in executors.

Incremental form (foreachBatch): reduce the micro-batch to its last
event per key, then merge into the state table with an anti-join +
union overwrite.  Without Delta/Iceberg MERGE in this container, the
overwrite is made idempotent by writing batch output to a staging dir
and renaming (write-audit-publish); re-processing the same batch after
a crash converges to the same state (SURVEY §2.F5 contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def latest_state(unwrapped: DataFrame) -> DataFrame:
    """Reduce a change set to current rows: last event per key wins;
    keys whose last event is a delete drop out (tombstone semantics,
    docs/design.md:61)."""
    pk = F.coalesce(F.col("after.id"), F.col("before.id"))
    w = W.partitionBy("pk").orderBy(F.desc("ts_ms"), F.desc("change_key"))
    return (
        unwrapped.withColumn("pk", pk)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col("op") != "d")
        .select("after.*")
    )


def merge_state(current: DataFrame, batch_latest: DataFrame,
                key: str = "id") -> DataFrame:
    """Merge a micro-batch's latest-per-key changes into the state table.

    upserts ∪ (current ⟕anti changed-keys): equivalent to MERGE INTO.
    ``batch_latest`` must carry ``op``/``after`` (pre-reduced by
    latest_state's window but BEFORE dropping deletes) — deletes remove
    keys, upserts replace rows.
    """
    changed_keys = batch_latest.select(F.col("pk").alias(key)).distinct()
    survivors = current.join(changed_keys, key, "left_anti")
    upserts = batch_latest.filter(F.col("op") != "d").select("after.*")
    return survivors.unionByName(upserts)


def batch_latest_with_deletes(unwrapped: DataFrame) -> DataFrame:
    """latest_state without dropping deletes — input to merge_state."""
    pk = F.coalesce(F.col("after.id"), F.col("before.id"))
    w = W.partitionBy("pk").orderBy(F.desc("ts_ms"), F.desc("change_key"))
    return (
        unwrapped.withColumn("pk", pk)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
