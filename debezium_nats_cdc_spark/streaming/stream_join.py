"""Watermarked stream-stream correlation (SURVEY.md §2.C6/H — the
streaming twin of the batch ``join_event_correlation``).

The reference correlates events across topics via causationId /
correlationId at read time (docs/system-design.md:189-209: a
SalaryAdjusted domain event carries the causing employee aggregate).
Structured Streaming expresses that as a STREAM-STREAM inner join:
both sides watermarked, join condition = equi key + event-time range.

State bound (the part that matters at scale): with watermarks on both
sides and a time-range predicate, Spark evicts buffered rows as the
watermark passes — state is O(events within the lag window), never the
whole history.  Without the range predicate the join would buffer both
streams forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.unwrap import unwrap

DEFAULT_WATERMARK = "10 minutes"
DEFAULT_MAX_LAG = "1 hour"


def correlate_salary_changes(
    emp_stream: DataFrame,
    sc_stream: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    max_lag: str = DEFAULT_MAX_LAG,
) -> DataFrame:
    """Join each salary_changes insert with the employee row-image event
    that precedes it (same employee, within ``max_lag``) — both sides
    live streams.

    Returns one row per (salary change, causing employee event) with the
    change amounts and the employee identity at change time.
    """
    e = (
        unwrap(emp_stream)
        .filter(F.col("op").isin("c", "r", "u"))
        .select(
            F.col("after.id").alias("emp_id"),
            F.col("after.employee_number").alias("employee_number"),
            F.col("after.first_name").alias("first_name"),
            F.col("after.last_name").alias("last_name"),
            F.col("event_time").alias("emp_time"),
        )
        .withWatermark("emp_time", watermark)
    )
    s = (
        unwrap(sc_stream)
        .filter(F.col("op") == "c")
        .select(
            F.col("after.id").alias("change_id"),
            F.col("after.employee_id").alias("employee_id"),
            F.col("after.old_salary").alias("old_salary"),
            F.col("after.new_salary").alias("new_salary"),
            F.col("event_time").alias("sc_time"),
        )
        .withWatermark("sc_time", watermark)
    )
    return s.join(
        e,
        (F.col("employee_id") == F.col("emp_id"))
        & (F.col("emp_time") <= F.col("sc_time"))
        & (F.col("emp_time") >= F.col("sc_time") - F.expr(f"INTERVAL {max_lag}")),
        "inner",
    ).select(
        "change_id", "employee_id", "employee_number", "first_name",
        "last_name", "old_salary", "new_salary", "sc_time", "emp_time",
    )
