"""The StateBackend seam proved with a SECOND implementation (VERDICT r3
task #4): the crash/replay/compaction suite runs parameterized over both
LocalFSBackend (rename-in-place) and GenerationPointerBackend
(commit-by-pointer) — if pipeline code had baked in LocalFS assumptions
(.staging/.old sibling paths, rename atomicity), the pointer backend
would fail these.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.sources import fixtures
from debezium_nats_cdc_spark.streaming import pipeline as pl
from debezium_nats_cdc_spark.streaming.pipeline import (
    PipelineDirs,
    process_batch,
    read_state,
    run_pipeline_until_done,
)
from debezium_nats_cdc_spark.streaming.state_backend import (
    GenerationPointerBackend,
    LocalFSBackend,
)
from tests.conftest import load_envelopes

BACKENDS = [LocalFSBackend, GenerationPointerBackend]


def _rows(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_swap_write_replaces_and_recover_is_noop_when_healthy(
        spark, tmp_root, backend_cls):
    b = backend_cls()
    final = os.path.join(tmp_root, "state")
    b.swap_write(_rows(spark, 5), final)
    assert spark.read.parquet(final).count() == 5
    b.swap_write(_rows(spark, 6), final)
    assert spark.read.parquet(final).count() == 6
    b.recover(final)  # healthy table: no-op
    assert spark.read.parquet(final).count() == 6
    assert b.has_data(final) and b.data_file_count(final) > 0


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_swap_write_over_append_built_table(spark, tmp_root, backend_cls):
    """State tables are BORN as plain append dirs (epoch publishes);
    the first compaction swap must handle that starting shape."""
    b = backend_cls()
    final = os.path.join(tmp_root, "state")
    b.append(_rows(spark, 4), final)
    b.append(_rows(spark, 4, start=100), final)
    assert spark.read.parquet(final).count() == 8
    b.swap_write(spark.read.parquet(final).filter("id < 100"), final)
    assert spark.read.parquet(final).count() == 4
    # appends keep working on the swapped table (next epoch's publish)
    b.append(_rows(spark, 3, start=200), final)
    assert spark.read.parquet(final).count() == 7


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_repeated_swaps_do_not_leak_generations(spark, tmp_root, backend_cls):
    """Each swap supersedes the previous generation entirely; storage
    must stay bounded (LocalFS: no .old/.staging residue; pointer: old
    gens pruned)."""
    b = backend_cls()
    final = os.path.join(tmp_root, "state")
    for i in range(4):
        b.swap_write(_rows(spark, 3 + i), final)
    assert spark.read.parquet(final).count() == 6
    root_entries = os.listdir(tmp_root)
    # at most the table itself + one sibling control dir (.gens)
    assert len(root_entries) <= 2
    gens = os.path.join(final + ".gens")
    if os.path.isdir(gens):  # pointer backend: exactly one live gen
        live = [d for d in os.listdir(gens) if not d.startswith(".")]
        assert len(live) == 1


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_pipeline_replay_with_compaction(spark, tmp_root, backend_cls,
                                         monkeypatch):
    """Full foreachBatch body, epoch replay, and a forced compaction
    (threshold 1 => every state append triggers swap_write) on each
    backend: sinks must stay byte-stable across the replay."""
    from debezium_nats_cdc_spark.operators.unwrap import unwrap

    monkeypatch.setattr(pl, "COMPACT_FILE_THRESHOLD", 1)
    dirs = PipelineDirs.under(tmp_root, backend=backend_cls())
    batch = unwrap(load_envelopes(
        spark, fixtures.snapshot_events() + fixtures.golden_workload(),
        "employees",
    ))
    process_batch(spark, batch, "employees", dirs, epoch_id=0)
    state_dir = os.path.join(dirs.state, "employees")
    counts = {
        "events": spark.read.parquet(dirs.events).count(),
        "audit": spark.read.parquet(dirs.audit).count(),
        "state": read_state(spark, dirs, "employees").count(),
    }
    assert counts["state"] > 0
    # replay the same epoch (crash-after-partial-commit recovery path)
    process_batch(spark, batch, "employees", dirs, epoch_id=0)
    assert spark.read.parquet(dirs.events).count() == counts["events"]
    assert spark.read.parquet(dirs.audit).count() == counts["audit"]
    assert read_state(spark, dirs, "employees").count() == counts["state"]
    # a NEW epoch lands and compacts again through the same seam
    process_batch(spark, batch, "employees", dirs, epoch_id=1)
    assert read_state(spark, dirs, "employees").count() == counts["state"]


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_e2e_golden_run_and_restart(spark, tmp_path, backend_cls,
                                    monkeypatch):
    """The golden streaming E2E (checkpointed run + idempotent restart)
    on each backend, with compaction forced so swap_write executes in
    the live pipeline, not just in unit tests."""
    monkeypatch.setattr(pl, "COMPACT_FILE_THRESHOLD", 2)
    root = str(tmp_path)
    log_dir = os.path.join(root, "log")
    events = fixtures.snapshot_events() + fixtures.golden_workload()
    fixtures.write_event_log(events, log_dir, events_per_file=5)
    dirs = run_pipeline_until_done(spark, log_dir, root,
                                   tables=["employees"],
                                   backend=backend_cls())
    emp = read_state(spark, dirs, "employees")
    assert sorted(r["employee_number"] for r in emp.collect()) == [
        "EMP001", "EMP002", "EMP003"]
    n1 = spark.read.parquet(dirs.events).count()
    # restart over the same log: committed offsets => nothing re-published
    run_pipeline_until_done(spark, log_dir, root, tables=["employees"],
                            backend=backend_cls())
    assert spark.read.parquet(dirs.events).count() == n1
    assert sorted(r["employee_number"]
                  for r in read_state(spark, dirs, "employees").collect()) == [
        "EMP001", "EMP002", "EMP003"]


def test_pointer_backend_heals_first_transition_crash(spark, tmp_root):
    """Pointer-specific crash window: the first swap of an append-built
    table moves the real dir aside before the pointer lands.  Simulate
    the crash (table path missing, complete generation present) and
    assert recover() re-points at the newest complete generation."""
    b = GenerationPointerBackend()
    final = os.path.join(tmp_root, "state")
    b.append(_rows(spark, 4), final)
    gen_root = b._gen_root(final)
    os.makedirs(gen_root, exist_ok=True)
    gen = os.path.join(gen_root, "g000007")
    _rows(spark, 9).write.mode("overwrite").parquet(gen)
    os.rename(final, os.path.join(gen_root, "displaced000007"))
    # crash here: no table path, complete gen on disk
    b.recover(final)
    assert os.path.islink(final)
    assert spark.read.parquet(final).count() == 9

    # variant: no complete generation -> the displaced dir comes back
    final2 = os.path.join(tmp_root, "state2")
    b.append(_rows(spark, 5), final2)
    gr2 = b._gen_root(final2)
    os.makedirs(gr2, exist_ok=True)
    os.rename(final2, os.path.join(gr2, "displaced000001"))
    b.recover(final2)
    assert spark.read.parquet(final2).count() == 5


def test_pointer_backend_heals_broken_pointer(spark, tmp_root):
    """A pointer whose target was pruned (or lost) is a broken symlink;
    recover must replace it with the newest complete generation."""
    import shutil

    b = GenerationPointerBackend()
    final = os.path.join(tmp_root, "state")
    b.swap_write(_rows(spark, 5), final)
    b.swap_write(_rows(spark, 6), final)
    # break the pointer: blow away its target, keep an older complete gen
    gen_root = b._gen_root(final)
    target = os.path.realpath(final)
    _rows(spark, 8).write.mode("overwrite").parquet(
        os.path.join(gen_root, "g000001"))
    shutil.rmtree(target)
    assert not os.path.exists(final) and os.path.islink(final)
    b.recover(final)
    assert spark.read.parquet(final).count() == 8


# ---------------------------------------------------------------------------
# Chaos shapes from the reference spec (docs/system-design.md:532-540,
# VERDICT r4 task #5): store unavailable mid-batch, partitioned/slow source.
# ---------------------------------------------------------------------------


def _flaky(backend_cls, failures: int, sink_prefix: str = "events-"):
    """Backend whose event-store publishes raise for the first N attempts
    — the 'columnar store down' chaos scenario.  Only the publish fails;
    the txn protocol must keep the failed epochs uncommitted so the
    retry republishes without loss or duplication."""

    class Flaky(backend_cls):
        def __init__(self):
            super().__init__()
            self.remaining = failures

        def append_exactly_once(self, df, table_dir, token, txn_dir,
                                partition_by=None):
            if token.startswith(sink_prefix) and self.remaining > 0:
                self.remaining -= 1
                raise IOError("store unavailable (injected)")
            return super().append_exactly_once(df, table_dir, token,
                                               txn_dir, partition_by)

    return Flaky()


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_store_down_mid_batch_recovers_without_loss_or_dupes(
        spark, tmp_root, backend_cls):
    """Event-store writes fail for two micro-batches, then the store
    comes back.  The query fails and restarts from its checkpoint; once
    recovered, every rule firing lands EXACTLY once — sibling sinks that
    committed before the failure are skipped on replay, failed epochs
    republish."""
    from pyspark.errors import StreamingQueryException

    from debezium_nats_cdc_spark.streaming.pipeline import (
        start_table_pipeline,
    )

    log_dir = os.path.join(tmp_root, "log")
    events = fixtures.snapshot_events() + fixtures.golden_workload()
    fixtures.write_event_log(events, log_dir, events_per_file=5)

    dirs = PipelineDirs.under(tmp_root, backend=_flaky(backend_cls, 2))
    attempts = 0
    while True:
        attempts += 1
        q = start_table_pipeline(spark, log_dir, "employees", dirs,
                                 max_files_per_trigger=1)
        try:
            q.awaitTermination()
            break
        except StreamingQueryException:
            assert attempts < 6, "pipeline never recovered"
    assert attempts > 1  # the outage really fired

    ev = spark.read.parquet(dirs.events)
    counts = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert counts == {"EmployeeHired": 1, "EmployeeDataUpdated": 1}
    emp = read_state(spark, dirs, "employees")
    assert sorted(r["employee_number"] for r in emp.collect()) == [
        "EMP001", "EMP002", "EMP003"]


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_slow_partitioned_source_empty_and_late_batches(
        spark, tmp_root, backend_cls):
    """A partitioned/slow source delivers: a normal batch, a completely
    EMPTY batch (source stalled), an out-of-order batch (event-time
    behind data already seen, within the 120 s dedup watermark), and a
    redelivered duplicate.  Required: late data processed (no loss),
    duplicate collapsed, and empty batches publish NOTHING (no sink
    commits for them)."""
    import json as _json

    from debezium_nats_cdc_spark.streaming.pipeline import (
        start_table_pipeline,
    )

    log_dir = os.path.join(tmp_root, "log")
    os.makedirs(log_dir)
    t = fixtures.BASE_TS_MS
    emp_a = {
        "id": 21, "employee_number": "EMP021", "first_name": "Ada",
        "last_name": "A", "email": "a@company.com", "position_id": "IC2",
        "department_id": 1, "manager_id": None, "salary": 90000.0,
        "hire_date": "2026-01-01", "status": "active",
    }
    emp_b = {**emp_a, "id": 22, "employee_number": "EMP022",
             "email": "b@company.com"}
    emp_a_upd = {**emp_a, "email": "ada@company.com"}
    insert_a = fixtures.envelope("employees", "c", None, emp_a, t + 1000)
    batches = [
        # f0: normal batch; B's later timestamp moves max event time ahead
        [insert_a,
         fixtures.envelope("employees", "c", None, emp_b, t + 60000)],
        [],  # f1: source stalled — empty micro-batch
        # f2: LATE out-of-order update to A (event time behind B's)
        [fixtures.envelope("employees", "u", emp_a, emp_a_upd, t + 2000)],
        [insert_a],  # f3: broker redelivery of the original insert
    ]
    for i, evs in enumerate(batches):
        with open(os.path.join(log_dir, f"chunk-{i:05d}.json"), "w") as f:
            for ev in evs:
                f.write(_json.dumps(ev) + "\n")

    dirs = PipelineDirs.under(tmp_root, backend=backend_cls())
    q = start_table_pipeline(spark, log_dir, "employees", dirs,
                             max_files_per_trigger=1)
    q.awaitTermination()

    ev = spark.read.parquet(dirs.events)
    counts = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    # late update processed, duplicate insert collapsed
    assert counts == {"EmployeeHired": 2, "EmployeeDataUpdated": 1}
    state = {r["employee_number"]: r["email"]
             for r in read_state(spark, dirs, "employees").collect()}
    assert state == {"EMP021": "ada@company.com", "EMP022": "b@company.com"}
    # exactly the two non-empty post-dedup batches committed to the
    # state sink: the stalled batch and the dup-only batch published 0
    committed = sum(
        dirs.backend.committed(f"state-employees-{e}", dirs.txn)
        for e in range(10)
    )
    assert committed == 2


def test_generation_retention_and_time_travel(spark, tmp_root):
    """keep_generations=3: superseded snapshots stay readable via
    read_generation (VERSION AS OF), older ones are vacuumed, and a
    pruned version raises with the retained list."""
    b = GenerationPointerBackend(keep_generations=3)
    final = os.path.join(tmp_root, "state")
    for i in range(1, 6):  # five epochs, distinct contents
        b.swap_write(_rows(spark, i * 10), final)
    assert b.list_generations(final) == [3, 4, 5]
    # live pointer == newest generation
    assert b.read_generation(spark, final).count() == 50
    assert b.read_generation(spark, final, 5).count() == 50
    # retained history reproduces each epoch's exact published state
    assert b.read_generation(spark, final, 4).count() == 40
    assert b.read_generation(spark, final, 3).count() == 30
    with pytest.raises(ValueError, match=r"retained: \[3, 4, 5\]"):
        b.read_generation(spark, final, 2)


def test_time_travel_survives_pointer_recovery(spark, tmp_root):
    """After a crash that loses the live pointer, recover() re-points at
    the newest snapshot and the retained history is still readable."""
    b = GenerationPointerBackend(keep_generations=2)
    final = os.path.join(tmp_root, "state")
    b.swap_write(_rows(spark, 10), final)
    b.swap_write(_rows(spark, 20), final)
    os.remove(final)  # simulate crash losing the symlink
    b.recover(final)
    assert spark.read.parquet(final).count() == 20
    assert b.list_generations(final) == [1, 2]
    assert b.read_generation(spark, final, 1).count() == 10


def test_default_retention_keeps_only_live_generation(spark, tmp_root):
    """keep_generations default (1) preserves the original prune
    behavior: exactly one generation on disk after every swap."""
    b = GenerationPointerBackend()
    final = os.path.join(tmp_root, "state")
    for i in range(1, 4):
        b.swap_write(_rows(spark, i), final)
    assert b.list_generations(final) == [3]
    gen_root = final + ".gens"
    assert [d for d in sorted(os.listdir(gen_root))
            if d.startswith("g")] == ["g000003"]


def test_pipeline_compaction_history_is_time_travelable(spark, tmp_root,
                                                        monkeypatch):
    """Pipeline integration for snapshot retention: with threshold 1
    every epoch compacts (swap_write), so each epoch publishes a
    generation.  keep_generations=2 must retain exactly the last two,
    and the older one must reproduce the state as of the PREVIOUS
    epoch — i.e. the new epoch's update is absent from it."""
    from debezium_nats_cdc_spark.operators.unwrap import unwrap

    monkeypatch.setattr(pl, "COMPACT_FILE_THRESHOLD", 1)
    b = GenerationPointerBackend(keep_generations=2)
    dirs = PipelineDirs.under(tmp_root, backend=b)
    snapshot = unwrap(load_envelopes(
        spark, fixtures.snapshot_events(), "employees"))
    process_batch(spark, snapshot, "employees", dirs, epoch_id=0)
    workload = unwrap(load_envelopes(
        spark, fixtures.golden_workload(), "employees"))
    process_batch(spark, workload, "employees", dirs, epoch_id=1)

    from debezium_nats_cdc_spark.operators.materialize import current_rows

    state_dir = os.path.join(dirs.state, "employees")
    gens = b.list_generations(state_dir)
    assert len(gens) == 2
    # a generation is a snapshot of the state LOG (incl. versioned
    # tombstones); resolve it exactly the way read_state resolves the
    # live log before comparing
    cur = current_rows(b.read_generation(spark, state_dir, gens[-1]))
    old = current_rows(b.read_generation(spark, state_dir, gens[0]))
    # live pointer == newest generation
    live = read_state(spark, dirs, "employees")
    assert {tuple(r) for r in cur.collect()} == \
        {tuple(r) for r in live.collect()}
    # the older snapshot is exactly the pre-workload (snapshot-only)
    # state: every change the workload epoch applied is missing from it
    assert old.count() == snapshot.select("after.id").distinct().count()
    # and replaying the snapshot alone into a fresh pipeline yields the
    # identical row set (time travel == state as of epoch 0)
    dirs2 = PipelineDirs.under(os.path.join(tmp_root, "replay"),
                               backend=GenerationPointerBackend())
    process_batch(spark, snapshot, "employees", dirs2, epoch_id=0)
    want = {tuple(r) for r in
            read_state(spark, dirs2, "employees").collect()}
    got = {tuple(r) for r in old.collect()}
    assert got == want


def test_data_rows_skips_staging_and_counts_recursively(tmp_path):
    """code-review r15 pass 2: data_rows must count the TABLE
    (partition subdirs included) while pruning `_`/`.`-prefixed
    bookkeeping — Spark's `_temporary/` staging holds half-written
    footers a concurrent poll must not open."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_nats_cdc_spark.streaming.state_backend import (
        LocalFSBackend,
    )

    root = tmp_path / "table"
    (root / "day=1").mkdir(parents=True)
    (root / "_temporary" / "0" / "task").mkdir(parents=True)
    pq.write_table(pa.table({"x": [1, 2, 3]}),
                   root / "part-0.parquet")
    pq.write_table(pa.table({"x": [4, 5]}),
                   root / "day=1" / "part-1.parquet")
    # a half-written footer in staging and a dot-file: both ignored
    (root / "_temporary" / "0" / "task" / "part-2.parquet").write_bytes(
        b"PAR1garbage-no-footer")
    (root / ".part-0.parquet.crc").write_bytes(b"x")
    b = LocalFSBackend()
    assert b.data_rows(str(root)) == 5
    assert b.data_rows(str(tmp_path / "missing")) == 0
