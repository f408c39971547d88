"""Materialization (H1/E2) + audit trail (F6/E3) against the golden
workload: final state must equal the seed (EMP999 net-deleted), audit
rows must carry field-level old/new values."""

from __future__ import annotations

from debezium_nats_cdc_spark.operators.audit import field_diff
from debezium_nats_cdc_spark.operators.materialize import (
    batch_latest_with_deletes,
    current_rows,
    initial_state,
    latest_state,
    merge_state,
)
from debezium_nats_cdc_spark.operators.unwrap import unwrap
from debezium_nats_cdc_spark.sources import fixtures

from conftest import load_envelopes


def _employees_changes(spark):
    evs = fixtures.snapshot_events() + fixtures.golden_workload()
    emp = [e for e in evs if e["payload"]["source"]["table"] == "employees"]
    return unwrap(load_envelopes(spark, emp, "employees"))


def test_latest_state_equals_seed(spark):
    """Snapshot + workload => EMP999 inserted, updated, deleted:
    final state == seed rows (scripts/test-cdc.sh golden)."""
    state = latest_state(_employees_changes(spark))
    rows = {r["employee_number"]: r for r in state.collect()}
    assert sorted(rows) == ["EMP001", "EMP002", "EMP003"]
    assert float(rows["EMP001"]["salary"]) == 120000.0


def test_latest_state_mid_stream(spark):
    """Cut the stream before the deletes: EMP999 present with the
    updated salary 95000 (update #2 wins over insert #1)."""
    evs = fixtures.snapshot_events() + fixtures.golden_workload()[:2]
    emp = [e for e in evs if e["payload"]["source"]["table"] == "employees"]
    state = latest_state(unwrap(load_envelopes(spark, emp, "employees")))
    rows = {r["employee_number"]: r for r in state.collect()}
    assert sorted(rows) == ["EMP001", "EMP002", "EMP003", "EMP999"]
    assert float(rows["EMP999"]["salary"]) == 95000.0


def test_incremental_merge_matches_batch(spark):
    """Applying the change stream in two micro-batches through
    merge_state converges to the same state as one batch window —
    the foreachBatch path's correctness invariant."""
    changes = _employees_changes(spark)
    one_shot = {r["employee_number"] for r in latest_state(changes).collect()}

    evs = fixtures.snapshot_events() + fixtures.golden_workload()
    emp = [e for e in evs if e["payload"]["source"]["table"] == "employees"]
    b1 = unwrap(load_envelopes(spark, emp[:4], "employees"))   # snapshot + insert
    b2 = unwrap(load_envelopes(spark, emp[4:], "employees"))   # update + delete

    state = initial_state(batch_latest_with_deletes(b1))
    state = merge_state(state, batch_latest_with_deletes(b2))
    incremental = {r["employee_number"] for r in current_rows(state).collect()}
    assert incremental == one_shot


def test_audit_field_diff(spark):
    """Update #2 (salary 90000->95000) produces exactly one audit row:
    field=salary with old/new values (docs/design.md:185-197)."""
    evs = fixtures.golden_workload()[1:2]
    cols = ["id", "employee_number", "salary", "status", "position_id", "department_id"]
    audit = field_diff(unwrap(load_envelopes(spark, evs, "employees")), cols)
    rows = audit.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["field"] == "salary"
    assert r["operation"] == "UPDATE"
    assert float(r["old_value"]) == 90000.0
    assert float(r["new_value"]) == 95000.0


def test_audit_insert_and_delete(spark):
    """INSERT audits every non-null after field (old NULL); DELETE the
    mirror image."""
    evs = fixtures.golden_workload()
    ins, dele = evs[0:1], evs[6:7]
    cols = ["employee_number", "salary"]
    a_ins = field_diff(unwrap(load_envelopes(spark, ins, "employees")), cols).collect()
    assert {r["field"] for r in a_ins} == {"employee_number", "salary"}
    assert all(r["old_value"] is None and r["operation"] == "INSERT" for r in a_ins)
    a_del = field_diff(unwrap(load_envelopes(spark, dele, "employees")), cols).collect()
    assert all(r["new_value"] is None and r["operation"] == "DELETE" for r in a_del)


def test_org_distance(spark):
    """Transitive closure over a 3-level hierarchy, depth-capped."""
    from debezium_nats_cdc_spark.operators.enrich import org_distance

    depts = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (4, 2)],
        "id long, parent_department_id long",
    )
    rows = {(r["dept_id"], r["ancestor_id"]): r["distance"]
            for r in org_distance(depts).collect()}
    assert rows[(2, 1)] == 1
    assert rows[(3, 2)] == 1
    assert rows[(3, 1)] == 2
    assert rows[(4, 1)] == 2
