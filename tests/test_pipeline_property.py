"""Pipeline-level property test: random CDC sequences through the FULL
foreachBatch body (rules, validation, events/audit/state sinks) under
random batch boundaries and random epoch replays.

Complements test_materialize_property (which model-checks the
materialization operators in isolation): here the invariants are
end-to-end —

  * state == the exact dict model, regardless of where batch
    boundaries fall;
  * every sink is invariant under replaying any prefix of epochs
    (exactly-once), byte-count-wise for events/audit and row-set-wise
    for state.

Duplicate deliveries are generated ADJACENT (within-batch): cross-batch
duplicate suppression belongs to the stream-level watermark dedup,
which test_streaming_e2e exercises.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings, strategies as st

from debezium_nats_cdc_spark.operators.unwrap import unwrap
from debezium_nats_cdc_spark.sources import fixtures
from debezium_nats_cdc_spark.streaming.pipeline import (
    PipelineDirs,
    process_batch,
    read_state,
)

from conftest import load_envelopes


def _workload():
    """(delivered_envelopes, state_model) from per-key op sequences with
    adjacent duplicate deliveries."""
    def build(args):
        ops_per_key, dup_stride = args
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
                    after = {**base, "salary": 50000.0 + i}
                    events.append(
                        fixtures.envelope("employees", "c", None, after, ts))
                    rows[key] = after
                    alive = True
                elif op == "u":
                    before = rows[key]
                    after = {**before, "salary": float(before["salary"]) + 1}
                    events.append(
                        fixtures.envelope("employees", "u", before, after, ts))
                    rows[key] = after
                else:
                    events.append(
                        fixtures.envelope("employees", "d", rows[key], None, ts))
                    rows[key] = None
                    alive = False
        delivered = []
        for i, e in enumerate(events):
            delivered.append(e)
            if i % dup_stride == 0:
                delivered.append(e)  # adjacent duplicate delivery
        model = {k: v for k, v in rows.items() if v is not None}
        return delivered, model

    return st.tuples(
        st.lists(st.lists(st.sampled_from(["c", "u", "d"]),
                          min_size=1, max_size=5),
                 min_size=1, max_size=3),
        st.integers(min_value=2, max_value=4),
    ).map(build)


def _run(spark, root, batches, replays):
    dirs = PipelineDirs.under(root)
    for epoch, batch_events in enumerate(batches):
        b = unwrap(load_envelopes(spark, batch_events, "employees"))
        process_batch(spark, b, "employees", dirs, epoch_id=epoch)
        for r in replays:  # replay earlier epochs out of order
            if r <= epoch:
                rb = unwrap(load_envelopes(spark, batches[r], "employees"))
                process_batch(spark, rb, "employees", dirs, epoch_id=r)
    counts = {}
    for sink in ("events", "audit"):
        path = getattr(dirs, sink)
        counts[sink] = (spark.read.parquet(path).count()
                        if os.listdir(path) else 0)
    state = {r["id"]: float(r["salary"])
             for r in read_state(spark, dirs, "employees").collect()}
    return counts, state


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(wl=_workload(),
       split=st.floats(min_value=0.15, max_value=0.85),
       replays=st.lists(st.integers(min_value=0, max_value=1), max_size=2))
def test_pipeline_state_and_sinks_invariant_under_batching_and_replay(
        spark, tmp_path_factory, wl, split, replays):
    delivered, model = wl
    cut = max(1, int(len(delivered) * split))
    two_batches = [delivered[:cut], delivered[cut:] or delivered[:0]]
    two_batches = [b for b in two_batches if b]

    root_a = str(tmp_path_factory.mktemp("pipeA"))
    root_b = str(tmp_path_factory.mktemp("pipeB"))
    counts_a, state_a = _run(spark, root_a, [delivered], replays=[])
    counts_b, state_b = _run(spark, root_b, two_batches, replays=replays)

    want = {k: float(v["salary"]) for k, v in model.items()}
    assert state_a == want
    assert state_b == want            # batching never changes state
    assert counts_a == counts_b, (    # replays never duplicate sinks
        f"sink counts diverged: 1-batch {counts_a} vs "
        f"2-batch+replay {counts_b}")
