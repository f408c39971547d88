"""D2 streaming materialized view: update-mode agg over the domain-event
stream, driven to completion via availableNow."""

from __future__ import annotations

import os

from debezium_nats_cdc_spark.operators.rules import apply_rules
from debezium_nats_cdc_spark.operators.unwrap import unwrap
from debezium_nats_cdc_spark.schemas import ENVELOPE_SCHEMAS
from debezium_nats_cdc_spark.sources import fixtures
from debezium_nats_cdc_spark.sources.cdc import read_change_stream
from debezium_nats_cdc_spark.streaming.matview import events_by_type_day, start_matview


def test_streaming_matview(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    fixtures.write_event_log(fixtures.golden_workload(), log_dir, events_per_file=3)

    stream = read_change_stream(spark, log_dir, "employees")
    events = apply_rules(unwrap(stream), "employees")
    q = start_matview(events, "mv_events", str(tmp_path / "ckpt"))
    q.awaitTermination()

    rows = {
        (r["event_type"], str(r["event_day"])): r["n_events"]
        for r in spark.sql("SELECT * FROM mv_events").collect()
    }
    assert rows[("EmployeeHired", "2026-01-01")] == 1
    assert rows[("EmployeeDataUpdated", "2026-01-01")] == 1


def test_matview_batch_equivalence(spark):
    """The same view definition runs unchanged on the batch event store
    (view maintenance vs. recompute give identical answers)."""
    from conftest import load_envelopes

    emp = [e for e in fixtures.golden_workload()
           if e["payload"]["source"]["table"] == "employees"]
    events = apply_rules(unwrap(load_envelopes(spark, emp, "employees")), "employees")
    got = {(r["event_type"], r["n_events"])
           for r in events_by_type_day(events).collect()}
    assert got == {("EmployeeHired", 1), ("EmployeeDataUpdated", 1)}
