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
