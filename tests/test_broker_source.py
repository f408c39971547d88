"""A1 broker-shaped source adapter (SURVEY.md §2.A1 "Kafka source
interchangeable").

The reference's Debezium server publishes Kafka-record-shaped messages
to per-table NATS subjects (config/debezium/application.properties:20-27,
config/nats/stream.json).  The adapter consumes exactly that wire shape
— (key, value, topic, partition, offset, timestamp) — via
BROKER_RECORD_SCHEMA + parse_broker_records; against a real broker only
the reader line changes to format("kafka").

Asserts the golden E2E workload behaves identically through the adapter
path: same event counts, same materialized state, duplicate delivery
still collapses.
"""

from __future__ import annotations

import os

import pytest

from debezium_nats_cdc_spark.sources import fixtures
from debezium_nats_cdc_spark.sources.cdc import read_broker_log, read_change_log
from debezium_nats_cdc_spark.streaming.pipeline import (
    read_state,
    run_pipeline_until_done,
)


@pytest.fixture(scope="module")
def broker_out(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("broker-e2e"))
    log_dir = os.path.join(root, "records")
    events = fixtures.snapshot_events() + fixtures.duplicate_delivery(
        fixtures.golden_workload(), dup_indexes=[1]
    )
    fixtures.write_broker_log(events, log_dir, events_per_file=5)
    return run_pipeline_until_done(
        spark, log_dir, root,
        tables=["employees", "salary_changes", "leave_requests"],
        source="broker",
    )


def test_broker_batch_read_matches_json_read(spark, tmp_path):
    """The adapter parse and the JSON-log parse produce identical typed
    envelopes for the same events."""
    events = fixtures.snapshot_events() + fixtures.golden_workload()
    jdir = os.path.join(str(tmp_path), "json")
    bdir = os.path.join(str(tmp_path), "broker")
    fixtures.write_event_log(events, jdir)
    fixtures.write_broker_log(events, bdir)
    j = read_change_log(spark, jdir, "employees")
    b = read_broker_log(spark, bdir, "employees")
    assert j.schema == b.schema
    assert sorted(map(str, j.collect())) == sorted(map(str, b.collect()))


def test_broker_event_store_counts(spark, broker_out):
    ev = spark.read.parquet(broker_out.events)
    counts = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts["EmployeeHired"] == 1
    assert counts["EmployeeDataUpdated"] == 1  # dup delivery collapsed
    assert counts["SalaryAdjusted"] == 1
    assert counts["LeaveRequested"] == 1


def test_broker_materialized_state(spark, broker_out):
    emp = read_state(spark, broker_out, "employees")
    nums = sorted(r["employee_number"] for r in emp.collect())
    # EMP999 hired then net-deleted in the golden workload -> seed only
    assert nums == ["EMP001", "EMP002", "EMP003"]
