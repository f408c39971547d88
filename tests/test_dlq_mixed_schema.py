"""DLQ reads must survive the r5 schema_version column bump.

A dead_letter dir appended across engine versions holds mixed-schema
parquet (pre-r5 files lack ``schema_version``).  Tooling reads go
through monitor.read_dlq / dlq_depth, which mergeSchema so the column
surfaces as NULL for old rows instead of silently vanishing when Spark
samples an old file for the schema.
"""

from __future__ import annotations

import os

from debezium_nats_cdc_spark.streaming.monitor import dlq_depth, read_dlq


def test_read_dlq_merges_pre_and_post_bump_files(spark, tmp_path):
    dlq = str(tmp_path / "dead_letter")
    # pre-r5 file: no schema_version
    spark.createDataFrame(
        [(1, "old-row", "payload:missing")],
        "event_id long, payload string, dlq_reason string",
    ).coalesce(1).write.mode("append").parquet(dlq)
    # post-r5 file: adds schema_version
    spark.createDataFrame(
        [(2, "new-row", "schema:hr.employees:v2:email", 2)],
        "event_id long, payload string, dlq_reason string, "
        "schema_version int",
    ).coalesce(1).write.mode("append").parquet(dlq)

    df = read_dlq(spark, dlq)
    assert "schema_version" in df.columns
    rows = {r["event_id"]: r["schema_version"] for r in df.collect()}
    assert rows == {1: None, 2: 2}
    assert dlq_depth(spark, dlq) == 2


def test_dlq_depth_missing_dir_is_zero(spark, tmp_path):
    assert dlq_depth(spark, os.path.join(str(tmp_path), "nope")) == 0
