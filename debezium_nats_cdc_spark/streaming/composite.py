"""Windowed composite events + external source union (SURVEY §2.I9/D1/H7, A9/F1).

I9 TeamCompositionChanged: "Multiple employee transfers" rolled into one
business event (docs/design.md:262) — a tumbling event-time window over
EmployeeTransferred events grouped by destination department, emitting a
composite when >= ``min_transfers`` land in the window.  Works identically
on a batch DataFrame of domain events and on a watermarked stream
(append mode emits once the watermark passes window end).

A9 external events: subjects hr.external.{payroll|timeclock|benefits}.*
(docs/design.md:31-37) carry their own JSON shape; normalize_external
maps them into the shared domain envelope, after which the pipeline is
identical (SURVEY §3.2) — union via unionByName(allowMissingColumns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.subjects import subject_match

WINDOW = "5 minutes"  # composite rollup window (H7)


def team_composition_changed(transfer_events: DataFrame,
                             min_transfers: int = 2,
                             watermark: str | None = None) -> DataFrame:
    """I9: roll EmployeeTransferred events into TeamCompositionChanged.

    One shuffle on (window, toDepartmentId); streaming state is bounded
    by the watermark.  The composite's aggregate is the department; its
    payload lists the member aggregateIds (collect_list is safe: group
    size is human-scale by construction — a department's transfers in a
    5-minute window).
    """
    to_dept = F.get_json_object("payload", "$.toDepartmentId").cast("long")
    src = transfer_events.filter(F.col("eventType") == "EmployeeTransferred")
    if watermark:
        src = src.withWatermark("timestamp", watermark)
    grouped = (
        src.withColumn("toDept", to_dept)
        .groupBy(F.window("timestamp", WINDOW).alias("win"), F.col("toDept"))
        .agg(
            F.count("*").alias("n_transfers"),
            F.sort_array(F.collect_list("aggregateId")).alias("memberIds"),
            F.max("timestamp").alias("last_ts"),
        )
        .filter(F.col("n_transfers") >= min_transfers)
    )
    return grouped.select(
        F.md5(
            F.concat_ws(
                "|",
                F.lit("TeamCompositionChanged"),
                F.col("toDept").cast("string"),
                F.col("win.start").cast("string"),
            )
        ).alias("eventId"),
        F.lit("TeamCompositionChanged").alias("eventType"),
        F.lit("organization").alias("eventCategory"),
        F.col("win.end").alias("timestamp"),
        F.col("toDept").cast("string").alias("aggregateId"),
        F.lit("Department").alias("aggregateType"),
        F.lit("1.0").alias("version"),
        F.to_json(
            F.struct(
                F.col("n_transfers").alias("transferCount"),
                F.col("memberIds").alias("employeeIds"),
            )
        ).alias("payload"),
        F.struct(
            F.lit("hr-cdc-engine").alias("source"),
            F.lit(None).cast("string").alias("causationId"),
            F.lit(None).cast("string").alias("correlationId"),
            F.lit(None).cast("string").alias("userId"),
        ).alias("metadata"),
    )


# ---------------------------------------------------------- external --

# hr.external.payroll.* sample payload (docs/sequence-diagrams Flow 2):
# {employeeId, fromDept, toDept, ...}
EXTERNAL_SCHEMA = T.StructType([
    T.StructField("subject", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("sourceSystem", T.StringType()),
    T.StructField("employeeId", T.StringType()),
    T.StructField("eventName", T.StringType()),
    T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
])

_ALLOWED_SOURCES = ("payroll", "timeclock", "benefits")


def normalize_external(ext: DataFrame) -> DataFrame:
    """External event -> shared domain envelope (validation per Flow 2:
    check structure + validate source system; unknown sources are left
    for the DLQ split downstream)."""
    known = ext.filter(
        subject_match("subject", "hr.external.payroll.*")
        | subject_match("subject", "hr.external.timeclock.*")
        | subject_match("subject", "hr.external.benefits.*")
    )
    system = F.split("subject", "\\.").getItem(2)
    return known.select(
        F.md5(
            F.concat_ws("|", "subject", F.col("ts_ms").cast("string"), "employeeId")
        ).alias("eventId"),
        F.coalesce(F.col("eventName"), F.lit("ExternalEvent")).alias("eventType"),
        F.concat(F.lit("external."), system).alias("eventCategory"),
        F.timestamp_millis("ts_ms").alias("timestamp"),
        F.col("employeeId").alias("aggregateId"),
        F.lit("Employee").alias("aggregateType"),
        F.lit("1.0").alias("version"),
        F.to_json(F.struct("attributes")).alias("payload"),
        F.struct(
            F.coalesce(F.col("sourceSystem"), system).alias("source"),
            F.lit(None).cast("string").alias("causationId"),
            F.lit(None).cast("string").alias("correlationId"),
            F.lit(None).cast("string").alias("userId"),
        ).alias("metadata"),
    )


def union_event_streams(cdc_events: DataFrame, external_events: DataFrame) -> DataFrame:
    """F1: heterogeneous inputs -> one transformer/store pipeline."""
    return cdc_events.unionByName(external_events, allowMissingColumns=True)
