"""Replay-safety of the epoch-keyed sink commit protocol (F5 contract).

The reference's delivery chain (JetStream ack + redelivery,
docs/system-design.md:548-552; store-first ordering docs/design.md:570-583)
means a consumer crash mid-batch re-delivers the batch, and the store
must not duplicate.  Spark's foreachBatch gives the same contract only
if the sinks are epoch-transactional — these tests crash/replay the
protocol at every window.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.sources import fixtures
from debezium_nats_cdc_spark.streaming.pipeline import (
    PipelineDirs,
    process_batch,
)
from debezium_nats_cdc_spark.streaming.state_backend import LocalFSBackend
from debezium_nats_cdc_spark.streaming.txn import append_exactly_once, committed

_backend = LocalFSBackend()
_swap_write = _backend.swap_write
recover_state_dir = _backend.recover
from tests.conftest import load_envelopes


def _rows(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_replayed_token_is_skipped(spark, tmp_root):
    final = os.path.join(tmp_root, "sink")
    txn = os.path.join(tmp_root, "txn")
    df = _rows(spark, 10)
    assert append_exactly_once(df, final, "s-0", txn) is True
    # replay: same epoch token -> publish skipped, no duplicate rows
    assert append_exactly_once(df, final, "s-0", txn) is False
    assert spark.read.parquet(final).count() == 10
    assert committed("s-0", txn)


def test_half_publish_is_healed_on_replay(spark, tmp_root):
    """Crash after moving a file prefix but before the marker: the
    replay must converge to exactly one copy of the batch."""
    final = os.path.join(tmp_root, "sink")
    txn = os.path.join(tmp_root, "txn")
    append_exactly_once(_rows(spark, 10), final, "s-0", txn)
    # simulate the crashed half-publish of epoch 1: stray token files
    # in the final dir, NO commit marker
    for i in range(3):
        shutil.copy(
            next(Path(final).glob("s-0-*.parquet")),
            os.path.join(final, f"s-1-{i:05d}.parquet"),
        )
    assert spark.read.parquet(final).count() > 10  # corrupted view
    append_exactly_once(_rows(spark, 5, start=100), final, "s-1", txn)
    out = spark.read.parquet(final)
    assert out.count() == 15  # 10 (epoch 0) + 5 (epoch 1), strays gone
    assert out.select("id").distinct().count() == 15


def test_distinct_epochs_both_land(spark, tmp_root):
    final = os.path.join(tmp_root, "sink")
    txn = os.path.join(tmp_root, "txn")
    append_exactly_once(_rows(spark, 10), final, "s-0", txn)
    append_exactly_once(_rows(spark, 7, start=50), final, "s-1", txn)
    assert spark.read.parquet(final).count() == 17


def test_partitioned_publish_preserves_layout(spark, tmp_root):
    final = os.path.join(tmp_root, "sink")
    txn = os.path.join(tmp_root, "txn")
    df = _rows(spark, 10).withColumn("p", (F.col("id") % 2).cast("string"))
    append_exactly_once(df, final, "s-0", txn, partition_by=["p"])
    append_exactly_once(df, final, "s-0", txn, partition_by=["p"])
    assert os.path.isdir(os.path.join(final, "p=0"))
    assert spark.read.parquet(final).count() == 10


def test_swap_write_clears_stale_old_and_recovers(spark, tmp_root):
    final = os.path.join(tmp_root, "state")
    _swap_write(_rows(spark, 5), final)
    # crash leftover: a stale .old from a prior generation
    os.makedirs(final + ".old", exist_ok=True)
    Path(final + ".old", "junk").write_text("x")
    _swap_write(_rows(spark, 6), final)  # must not ENOTEMPTY
    assert spark.read.parquet(final).count() == 6
    assert not os.path.exists(final + ".old")

    # crash window: final renamed away, staging complete, swap not done
    _rows(spark, 7).write.mode("overwrite").parquet(final + ".staging")
    os.rename(final, final + ".old")
    recover_state_dir(final)  # prefers the newer complete staging
    assert spark.read.parquet(final).count() == 7
    assert not os.path.exists(final + ".old")


def test_pipeline_batch_replay_no_duplicates(spark, tmp_root):
    """Full foreachBatch body replayed with the same epoch: event store,
    audit trail, and state log must be byte-stable (no extra rows)."""
    from debezium_nats_cdc_spark.operators.unwrap import unwrap

    dirs = PipelineDirs.under(tmp_root)
    batch = unwrap(load_envelopes(
        spark, fixtures.snapshot_events() + fixtures.golden_workload(),
        "employees",
    ))
    process_batch(spark, batch, "employees", dirs, epoch_id=0)
    counts = {
        "events": spark.read.parquet(dirs.events).count(),
        "audit": spark.read.parquet(dirs.audit).count(),
        "state": spark.read.parquet(os.path.join(dirs.state, "employees")).count(),
    }
    # replay the same epoch (crash-after-partial-commit recovery path)
    process_batch(spark, batch, "employees", dirs, epoch_id=0)
    assert spark.read.parquet(dirs.events).count() == counts["events"]
    assert spark.read.parquet(dirs.audit).count() == counts["audit"]
    state_dir = os.path.join(dirs.state, "employees")
    assert spark.read.parquet(state_dir).count() == counts["state"]
    # a NEW epoch still lands
    process_batch(spark, batch.limit(0), "employees", dirs, epoch_id=1)
    assert spark.read.parquet(dirs.events).count() == counts["events"]


def test_random_crash_injection_converges(spark, tmp_root):
    """Property: crash the publish protocol at ANY step boundary, replay,
    and the final table equals exactly one copy of every epoch's batch.

    Steps crashed between: staging written -> strays cleaned -> files
    moved (also mid-move) -> marker written.  Each epoch is attempted
    through a crashing publisher at every injection point, then replayed
    cleanly — convergence must hold regardless of where the crash hit.
    """
    import itertools

    from debezium_nats_cdc_spark.streaming import txn

    final = os.path.join(tmp_root, "sink")
    tdir = os.path.join(tmp_root, "txn")

    class Crash(Exception):
        pass

    def crashing_publish(staging, final_dir, token, crash_after_files):
        """_publish clone that dies after moving crash_after_files files."""
        src_root = Path(staging)
        dest_root = Path(final_dir)
        if dest_root.exists():
            for stale in dest_root.rglob(token + "-*"):
                stale.unlink()
        files = sorted(p for p in src_root.rglob("*")
                       if p.is_file() and not p.name.startswith(("_", ".")))
        for i, src in enumerate(files):
            if i == crash_after_files:
                raise Crash
            dest_dir = dest_root / src.parent.relative_to(src_root)
            dest_dir.mkdir(parents=True, exist_ok=True)
            os.replace(src, dest_dir / f"{token}-{i:05d}.parquet")

    # deterministic schedule of injection points per epoch
    injection = itertools.cycle([0, 1, 2, 99])  # 99 => after all moves,
    #                                                 before the marker
    for epoch in range(6):
        df = _rows(spark, 8, start=epoch * 100)
        token = f"s-{epoch}"
        # attempt 1: staged write succeeds, publish crashes mid-move
        staging = os.path.join(tdir, token + ".staging")
        os.makedirs(tdir, exist_ok=True)
        df.write.mode("overwrite").parquet(staging)
        try:
            crashing_publish(staging, final, token, next(injection))
        except Crash:
            pass
        assert not txn.committed(token, tdir)  # crash => no marker
        # replay (Structured Streaming re-runs the batch)
        assert txn.append_exactly_once(df, final, token, tdir) is True

    out = spark.read.parquet(final)
    assert out.count() == 6 * 8
    assert out.select("id").distinct().count() == 6 * 8
    for epoch in range(6):
        assert txn.committed(f"s-{epoch}", tdir)


def test_fresh_checkpoint_clears_stale_markers(spark, tmp_root):
    """Checkpoint reset => epoch ids restart at 0; stale markers from the
    previous run must be cleared so the new run PUBLISHES instead of
    silently skipping every batch."""
    import glob

    from debezium_nats_cdc_spark.streaming.pipeline import (
        run_pipeline_until_done,
    )

    log_dir = os.path.join(tmp_root, "log")
    events = fixtures.snapshot_events() + fixtures.golden_workload()
    fixtures.write_event_log(events, log_dir, events_per_file=5)
    dirs = run_pipeline_until_done(spark, log_dir, tmp_root,
                                   tables=["employees"])
    n1 = spark.read.parquet(dirs.events).count()
    assert glob.glob(os.path.join(dirs.txn, "events-employees-*.commit"))

    # operator resets the checkpoint AND clears the sink to reprocess
    # the log from scratch (e.g. after a rule change)
    shutil.rmtree(dirs.checkpoints)
    shutil.rmtree(dirs.events)
    run_pipeline_until_done(spark, log_dir, tmp_root, tables=["employees"])
    n2 = spark.read.parquet(dirs.events).count()
    # the bug: stale markers matched the new run's epoch 0, every batch
    # was silently skipped, and the cleared sink stayed EMPTY forever
    assert n2 == n1
