"""Unit tests for subject globs (SURVEY §7 risk 4), validation split,
masking, retention, and the event-store round trip."""

from __future__ import annotations

import os
import re

import pytest

from debezium_nats_cdc_spark.functions.subjects import subject_match, subject_to_regex


CASES = [
    ("HCM.CDC.HR.hrdb.employees", "HCM.CDC.HR.hrdb.employees", True),
    ("HCM.CDC.HR.hrdb.employees", "HCM.CDC.HR.*.employees", True),
    ("HCM.CDC.HR.other.employees", "HCM.CDC.HR.*.employees", True),
    ("HCM.CDC.HR.a.b.employees", "HCM.CDC.HR.*.employees", False),  # * = ONE token
    ("HCM.CDC.HR.hrdb.employees", "HCM.CDC.HR.>", True),
    ("HCM.CDC.HR.hrdb.x.y.z", "HCM.CDC.HR.>", True),
    ("HCM.CDC.HR", "HCM.CDC.HR.>", False),            # > needs >= 1 more token
    ("hr.external.payroll.salary", "hr.external.payroll.*", True),
    ("hr.external.payroll", "hr.external.payroll.*", False),
    ("events.hr.employee.hired", "events.hr.*.hired", True),
]


@pytest.mark.parametrize("subject,pattern,expect", CASES)
def test_subject_regex_semantics(subject, pattern, expect):
    assert bool(re.match(subject_to_regex(pattern), subject)) is expect


def test_subject_match_column(spark):
    df = spark.createDataFrame([(s,) for s, _, _ in CASES], "subject string")
    got = df.filter(subject_match("subject", "HCM.CDC.HR.>")).count()
    want = sum(1 for s, _, _ in CASES if s.startswith("HCM.CDC.HR."))
    assert got == want


def test_gt_must_be_last():
    with pytest.raises(ValueError):
        subject_to_regex("HCM.>.HR")
    with pytest.raises(ValueError):
        subject_match("s", "a.>.b")


def test_validation_split(spark):
    from debezium_nats_cdc_spark.operators.validate import split_valid

    rows = [
        ("e1", "EmployeeHired", "2026-01-01 00:00:00", "1", '{"a":1}'),
        (None, "EmployeeHired", "2026-01-01 00:00:00", "1", '{"a":1}'),   # no id
        ("e3", "EmployeeHired", "2026-01-01 00:00:00", None, '{"a":1}'),  # no aggregate
    ]
    df = spark.createDataFrame(
        rows, "eventId string, eventType string, ts string, aggregateId string, payload string"
    ).selectExpr("eventId", "eventType", "cast(ts as timestamp) as timestamp",
                 "aggregateId", "payload")
    valid, dlq = split_valid(df)
    assert valid.count() == 1
    reasons = {r["invalid_reason"] for r in dlq.collect()}
    assert reasons == {"missing_eventId", "missing_aggregateId"}


def test_mask_pii(spark):
    from debezium_nats_cdc_spark.operators.validate import mask_pii

    df = spark.createDataFrame(
        [('{"ssn":"123-45-6789","name":"Jo"}',)], "payload string"
    )
    out = mask_pii(df, ["ssn"]).collect()[0]["payload"]
    assert "123-45-6789" not in out
    assert '"name":"Jo"' in out


def test_event_store_retention(spark, tmp_path):
    from debezium_nats_cdc_spark import store
    from debezium_nats_cdc_spark.operators.rules import apply_rules
    from debezium_nats_cdc_spark.operators.unwrap import unwrap
    from debezium_nats_cdc_spark.sources import fixtures
    from conftest import load_envelopes

    path = str(tmp_path / "events")
    # two different months of events
    e1 = fixtures.golden_workload()[0]
    e2 = {**e1}
    import copy, json as _json
    e2 = copy.deepcopy(e1)
    e2["payload"]["ts_ms"] = fixtures.BASE_TS_MS + 40 * 86400_000  # Feb 2026
    e2["payload"]["source"]["ts_ms"] = e2["payload"]["ts_ms"]
    e2["payload"]["after"]["id"] = 5
    e2["payload"]["after"]["employee_number"] = "EMP998"

    for ev in ([e1], [e2]):
        events = apply_rules(
            unwrap(load_envelopes(spark, ev, "employees")), "employees"
        )
        store.append_events(events, path)

    months = sorted(os.listdir(path))
    assert any("202601" in m for m in months) and any("202602" in m for m in months)
    doomed = store.expire_partitions(spark, path, keep_months=1)
    assert doomed == ["202601"]
    left = spark.read.parquet(path)
    assert left.count() == 1 and left.collect()[0]["event_month"] == "202602"
