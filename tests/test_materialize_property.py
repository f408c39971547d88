"""Property-based materialization test (SURVEY §5 test plan item d).

Model-based: generate arbitrary valid CDC sequences (insert/update/delete
per key, with duplicate deliveries interleaved), apply them to a trivial
Python dict model, and assert the engine's latest_state window — and the
two-micro-batch incremental merge — agree with the model exactly.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st

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


def _sequences():
    """Strategy: per-key op sequences c (u|d-then-c)* over <=4 keys."""
    def build(ops_per_key: list[list[str]]):
        events = []
        ts = fixtures.BASE_TS_MS
        rows: dict[int, dict | None] = {}
        for key, ops in enumerate(ops_per_key, start=10):
            base = {
                **fixtures.SEED_EMPLOYEES[0],
                "id": key,
                "employee_number": f"EMP{key:03d}",
            }
            alive = False
            for i, op in enumerate(ops):
                ts += 1000
                if not alive:
                    # regardless of requested op, a dead key must insert
                    after = {**base, "salary": 50000.0 + i}
                    events.append(fixtures.envelope("employees", "c", None, after, ts))
                    rows[key] = after
                    alive = True
                elif op == "u":
                    before = rows[key]
                    after = {**before, "salary": float(before["salary"]) + 1}
                    events.append(fixtures.envelope("employees", "u", before, after, ts))
                    rows[key] = after
                elif op == "d":
                    events.append(fixtures.envelope("employees", "d", rows[key], None, ts))
                    rows[key] = None
                    alive = False
        model = {k: v for k, v in rows.items() if v is not None}
        return events, model

    return st.lists(
        st.lists(st.sampled_from(["c", "u", "d"]), min_size=1, max_size=6),
        min_size=1,
        max_size=4,
    ).map(build)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seq=_sequences(), dup_stride=st.integers(min_value=2, max_value=4),
       split=st.floats(min_value=0.1, max_value=0.9))
def test_materialization_matches_model(spark, seq, dup_stride, split):
    events, model = seq
    # duplicate every dup_stride-th event (at-least-once delivery)
    delivered = fixtures.duplicate_delivery(
        events, dup_indexes=list(range(0, len(events), dup_stride))
    )

    # engine path 1: one-shot window materialization (dedup by change_key
    # is implied: duplicate rows tie on ts and collapse via row_number)
    unwrapped = unwrap(load_envelopes(spark, delivered, "employees"))
    got = {
        r["id"]: float(r["salary"]) for r in latest_state(unwrapped).collect()
    }
    want = {k: float(v["salary"]) for k, v in model.items()}
    assert got == want

    # engine path 2: incremental merge across a random batch boundary
    cut = max(1, int(len(delivered) * split))
    b1 = unwrap(load_envelopes(spark, delivered[:cut], "employees"))
    b2 = unwrap(load_envelopes(spark, delivered[cut:], "employees"))
    state = initial_state(batch_latest_with_deletes(b1))
    if delivered[cut:]:
        state = merge_state(state, batch_latest_with_deletes(b2))
    got2 = {r["id"]: float(r["salary"]) for r in current_rows(state).collect()}
    assert got2 == want
