"""Streaming materialized views (SURVEY §2.D2).

The reference's ClickHouse "materialized views for real-time
aggregations" (docs/system-design.md:130-134) — engine form: a streaming
aggregation in update mode, maintaining per-(type, day) counters that
downstream dashboards read.  State is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def events_by_type_day(domain_events: DataFrame,
                       watermark: str = "1 hour") -> DataFrame:
    """Counters per (event_type, day): the D4 capacity rollup maintained
    incrementally.  Partial aggregation happens map-side per micro-batch;
    the state store holds one row per group."""
    src = domain_events
    if src.isStreaming:
        src = src.withWatermark("timestamp", watermark)
    return src.groupBy(
        F.col("eventType").alias("event_type"),
        F.to_date("timestamp").alias("event_day"),
    ).agg(
        F.count("*").alias("n_events"),
        F.approx_count_distinct("aggregateId").alias("approx_aggregates"),
    )


def start_matview(domain_events: DataFrame, query_name: str,
                  checkpoint: str):
    """Run the view against a streaming source into an in-memory sink
    (swap format('memory') for a Delta/JDBC serving table in prod)."""
    view = events_by_type_day(domain_events)
    return (
        view.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
