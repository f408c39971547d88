"""Envelope unwrap (SURVEY.md §2.B1/B2).

The reference applies Debezium's ExtractNewRecordState transform with
tombstones kept (docs/design.md:59-62).  Here: one projection flattening
the typed envelope; tombstones (after IS NULL) stay, flagged.  Pure
column pruning — Catalyst pushes the struct-field selection into the
scan, so unselected row fields are never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def unwrap(df: DataFrame) -> DataFrame:
    """Flatten payload{before, after, op, source} + derived columns.

    Output: op, ts_ms, event_time, subject, db, table, before, after,
    is_tombstone, change_key (stable id of the source change, used as
    causationId and for idempotent dedup).
    """
    out = df.select(
        F.col("payload.op").alias("op"),
        F.col("payload.ts_ms").alias("ts_ms"),
        F.col("event_time"),
        F.col("subject"),
        F.col("payload.source.db").alias("db"),
        F.col("payload.source.table").alias("table"),
        F.col("payload.before").alias("before"),
        F.col("payload.after").alias("after"),
    )
    pk = F.coalesce(F.col("after.id"), F.col("before.id")).cast("string")
    return out.withColumn("is_tombstone", F.col("after").isNull()).withColumn(
        "change_key",
        F.md5(
            F.concat_ws(
                "|", F.col("table"), F.col("op"), F.col("ts_ms").cast("string"), pk
            )
        ),
    )
