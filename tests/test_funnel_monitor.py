"""FunnelMonitor: incremental dominance-pruned state scored by the
shared funnel kernel == batch recompute over everything ingested,
including the adversarial case — a LATE upstream event (an early view
arriving last) that must unlock a click an earlier batch could not
count; replay idempotence; pruning actually shrinks the state;
fresh-checkpoint epoch reset.
"""

from __future__ import annotations

from datetime import datetime

from debezium_nats_cdc_spark.operators.funnel import events_funnel_conversion
from debezium_nats_cdc_spark.streaming.funnel_monitor import FunnelMonitor

_EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                  "event_type string, value double, props string")


def _events(spark, rows):
    data = [(i, ts, uid, et, None, None)
            for i, (uid, et, ts) in enumerate(rows)]
    return spark.createDataFrame(data, _EVENTS_SCHEMA)


def _t(minute, second=0):
    return datetime(2024, 1, 1, 12, minute, second)


# user 1: clean in-order funnel split across batches
# user 2: the ADVERSARIAL case — click@2 and purchase@4 arrive first,
#         the view@1 that unlocks them arrives LAST; a naive
#         stage-timestamp state discards the click in B1 and never
#         converts the user, the exact pruned state must.
# user 3: out-of-order WITHIN the funnel: purchase precedes its click
#         in arrival AND a second, earlier view arrives late, moving
#         the stage-1 gate down (t1 5 -> 3) without changing t2
#         (click@7 > both) — gate recomputation must stay exact.
# user 4: never converts (click before any view), plus NULL user/ts
#         noise rows.
B1 = [
    (1, "view", _t(0)), (1, "click", _t(2)),
    (2, "click", _t(2)), (2, "purchase", _t(4)),
    (3, "purchase", _t(9)),
    (4, "click", _t(1)),
    (None, "view", _t(0)), (1, "view", None),
]
B2 = [
    (1, "purchase", _t(5)), (1, "click", _t(8)),  # later click: not the min
    (3, "view", _t(5)), (3, "click", _t(7)),
    (4, "view", _t(3)),
]
B3 = [
    (2, "view", _t(1)),          # the late unlock
    (3, "view", _t(3)),          # late earlier view: gate moves down
    (2, "purchase", _t(3)),      # before the click gate t2=2? no: 3 > 2 — NEW min purchase
]


def _batch_ground_truth(spark, tmp_path, all_rows):
    (_events(spark, all_rows).write.mode("overwrite")
     .parquet(f"{tmp_path}/events.parquet"))
    return events_funnel_conversion(spark, str(tmp_path))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_equals_batch_recompute(spark, tmp_path):
    mon = FunnelMonitor(str(tmp_path / "mon"))
    for i, b in enumerate([B1, B2, B3]):
        mon.process_batch(spark, _events(spark, b), epoch_id=i)
    expect = _batch_ground_truth(spark, tmp_path / "truth", B1 + B2 + B3)
    assert _rows(mon.scored(spark)) == _rows(expect)
    # the late view DID unlock user 2: stage 3 counts users 1, 2, 3
    scored = {r.stage: r for r in mon.scored(spark).collect()}
    assert scored[1].n_users == 4          # users 1..4 all viewed
    assert scored[3].n_users == 3          # users 1, 2, 3 converted


def test_every_prefix_matches_batch(spark, tmp_path):
    """After EVERY micro-batch the scored state equals the batch kernel
    over exactly the events ingested so far (not just at the end)."""
    mon = FunnelMonitor(str(tmp_path / "mon"))
    seen: list = []
    for i, b in enumerate([B1, B2, B3]):
        mon.process_batch(spark, _events(spark, b), epoch_id=i)
        seen += b
        expect = _batch_ground_truth(spark, tmp_path / f"truth{i}", seen)
        assert _rows(mon.scored(spark)) == _rows(expect), f"batch {i}"


def test_pruning_shrinks_state(spark, tmp_path):
    """Dominated rows (later views, post-gate clicks) must not pile up:
    with everything in-order the state holds ~one row per (user, stage
    reached), far below the raw distinct projection."""
    rows = []
    for uid in range(1, 21):
        rows += [(uid, "view", _t(m)) for m in range(0, 10)]       # 10 views
        rows += [(uid, "click", _t(m, 30)) for m in range(0, 10)]  # 10 clicks
        rows += [(uid, "purchase", _t(m, 45)) for m in range(5, 10)]
    mon = FunnelMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, rows), epoch_id=0)
    n_state = mon.state_rows(spark).count()
    # exact floor: per user 1 view + clicks <= t2 (just the first) +
    # purchases <= t3 (just the first) = 3; allow slack for ties
    assert n_state <= 20 * 4
    expect = _batch_ground_truth(spark, tmp_path / "truth", rows)
    assert _rows(mon.scored(spark)) == _rows(expect)


def test_replayed_epoch_is_noop(spark, tmp_path):
    mon = FunnelMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)
    snap = _rows(mon.state_rows(spark))
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)  # replay
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)  # older replay
    assert _rows(mon.state_rows(spark)) == snap
    assert mon.last_epoch(spark) == 1


def test_streaming_entrypoint_continues_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _events(spark, B1).coalesce(1).write.parquet(f"{src}/f0")
    _events(spark, B2).coalesce(1).write.parquet(f"{src}/f1")
    root = str(tmp_path / "mon")
    mon = FunnelMonitor(root)
    stream = (spark.readStream.schema(_EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/f*"))
    mon.start(spark, stream).awaitTermination()
    expect = _batch_ground_truth(spark, tmp_path / "truth", B1 + B2)
    assert _rows(mon.scored(spark)) == _rows(expect)
    assert mon.last_epoch(spark) == 1  # two files, one per trigger

    # restart on the SAME checkpoint with a new file landed: the epoch
    # sequence continues (2), the guard is NOT reset, the late view in
    # B3 still unlocks user 2's earlier click+purchase
    _events(spark, B3).coalesce(1).write.parquet(f"{src}/f2")
    mon2 = FunnelMonitor(root)
    stream2 = (spark.readStream.schema(_EVENTS_SCHEMA)
               .option("maxFilesPerTrigger", 1)
               .parquet(f"{src}/f*"))
    mon2.start(spark, stream2).awaitTermination()
    expect2 = _batch_ground_truth(spark, tmp_path / "truth2", B1 + B2 + B3)
    assert _rows(mon2.scored(spark)) == _rows(expect2)
    assert mon2.last_epoch(spark) == 2


def test_fresh_checkpoint_restart_keeps_folding(spark, tmp_path):
    """A checkpoint reset restarts epoch ids at 0; the replay guard must
    not silently drop the new data (the TfidfMonitor contract)."""
    root = str(tmp_path / "mon")
    mon = FunnelMonitor(root)
    mon.process_batch(spark, _events(spark, B1), epoch_id=40)
    mon.process_batch(spark, _events(spark, B2), epoch_id=41)
    assert mon.last_epoch(spark) == 41

    # restart with a FRESH checkpoint on a NEW source: epochs restart
    # at 0, which the stale guard (41) would silently drop without the
    # start()-time reset
    src = tmp_path / "src2"
    src.mkdir()
    _events(spark, B3).coalesce(1).write.parquet(f"{src}/f0")
    mon2 = FunnelMonitor(root)
    stream = (spark.readStream.schema(_EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/f*"))
    mon2.start(spark, stream).awaitTermination()
    expect = _batch_ground_truth(spark, tmp_path / "truth", B1 + B2 + B3)
    assert _rows(mon2.scored(spark)) == _rows(expect)
    assert mon2.last_epoch(spark) == 0  # the new checkpoint's sequence


def test_compact_collapses_frozen_users_and_stays_exact(spark, tmp_path):
    """Watermark finalization: after compact(W), users whose gates froze
    below W hold at most one row per stage, and scoring stays equal to
    the batch recompute for any future ingest respecting the no-event-
    below-W contract."""
    from pyspark.sql import functions as F

    # user 7: noisy funnel, fully converted well before W — many
    # dominated-but-kept rows (clicks <= t1 that only a smaller future
    # view could have unlocked)
    rows = [(7, "view", _t(5))]
    rows += [(7, "click", _t(m)) for m in range(0, 5)]      # all <= t1
    rows += [(7, "click", _t(6)), (7, "purchase", _t(7))]
    rows += [(7, "purchase", _t(m)) for m in range(0, 7)]   # all <= t2
    # user 8: t1 frozen, no qualifying click yet (t2 NULL) — its
    # pre-gate clicks can never qualify once t1 freezes
    rows += [(8, "view", _t(4)), (8, "click", _t(1)), (8, "click", _t(2))]
    mon = FunnelMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, rows), epoch_id=0)
    pre = mon.state_rows(spark).count()

    from datetime import timezone

    # explicit UTC: state ts_us came from unix_micros under the UTC
    # session, and naive datetime.timestamp() would use the machine tz
    watermark_us = int(_t(20).replace(tzinfo=timezone.utc)
                       .timestamp() * 1_000_000)
    mon.compact(spark, watermark_us)
    post = mon.state_rows(spark)
    assert post.count() < pre
    # user 7 collapsed to exactly its three gate rows
    u7 = {(r.event_type, r.ts_us) for r in
          post.filter(F.col("user_id") == 7).collect()}
    assert len(u7) == 3 and {t for t, _ in u7} == {"view", "click",
                                                   "purchase"}
    # user 8: the frozen-t1 dead clicks dropped, the view stays
    u8 = [r.event_type for r in post.filter(F.col("user_id") == 8).collect()]
    assert u8 == ["view"]

    # scoring still equals batch over everything ingested...
    expect = _batch_ground_truth(spark, tmp_path / "truth", rows)
    assert _rows(mon.scored(spark)) == _rows(expect)
    # ...including after further ingest that respects the contract
    # (every new event >= W); user 8 finally converts
    late = [(8, "click", _t(21)), (8, "purchase", _t(22)),
            (7, "view", _t(25))]
    mon.process_batch(spark, _events(spark, late), epoch_id=1)
    expect2 = _batch_ground_truth(spark, tmp_path / "truth2", rows + late)
    assert _rows(mon.scored(spark)) == _rows(expect2)


def test_compact_drops_never_converting_users_below_watermark(
        spark, tmp_path):
    """ADVICE r10 regression: a user with stage-k rows but NO stage-1
    gate at all (never-converting) must not leak state past the
    watermark — under the no-late-arrivals contract any future upstream
    gate is >= W and qualification is strict >, so stage-k rows with
    ts_us <= W can never qualify and compact() drops them entirely."""
    from pyspark.sql import functions as F

    # user 9: orphan clicks + purchase, no view ever (_g1 NULL)
    rows = [(9, "click", _t(1)), (9, "click", _t(2)),
            (9, "purchase", _t(3)),
            # user 10: control — a converting user whose rows survive
            (10, "view", _t(1)), (10, "click", _t(2)),
            (10, "purchase", _t(3))]
    mon = FunnelMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, rows), epoch_id=0)
    assert mon.state_rows(spark).filter(F.col("user_id") == 9).count() == 3

    from datetime import timezone

    watermark_us = int(_t(20).replace(tzinfo=timezone.utc)
                       .timestamp() * 1_000_000)
    mon.compact(spark, watermark_us)
    post = mon.state_rows(spark)
    # the leak is gone: user 9 holds ZERO rows, not 3-forever
    assert post.filter(F.col("user_id") == 9).count() == 0
    assert post.filter(F.col("user_id") == 10).count() == 3

    # exactness preserved: scoring == batch now...
    expect = _batch_ground_truth(spark, tmp_path / "truth", rows)
    assert _rows(mon.scored(spark)) == _rows(expect)
    # ...and after user 9 finally starts a funnel with >= W events
    # (their dropped pre-W clicks could never have qualified anyway:
    # the new view gate is >= W and qualification is strict >)
    late = [(9, "view", _t(21)), (9, "click", _t(23)),
            (9, "purchase", _t(24))]
    mon.process_batch(spark, _events(spark, late), epoch_id=1)
    expect2 = _batch_ground_truth(spark, tmp_path / "truth2", rows + late)
    assert _rows(mon.scored(spark)) == _rows(expect2)


def test_prune_plan_is_one_shuffle_no_joins(spark, tmp_path):
    """Plan pin for the fused pruning kernel (BENCHLOG round-12 cut 4):
    the per-fold gate computation must stay one user_id exchange with
    zero joins — the join-chain it replaced paid 7 exchanges and 6
    joins per micro-batch, and nothing but this pin stops it from
    creeping back."""
    mon = FunnelMonitor(str(tmp_path))
    rows = spark.createDataFrame(
        [(1, "view", 10), (1, "click", 20), (1, "purchase", 30)],
        "user_id bigint, event_type string, ts_us bigint")
    plan = (mon._prune(rows)
            ._jdf.queryExecution().executedPlan().toString())
    # pin on specific node spellings (ADVICE r12): a bare "Exchange"
    # count also matches ReusedExchange, and a bare "Join" scan breaks
    # (or silently shifts meaning) across Spark plan-string changes
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange rangepartitioning") == 0, plan
    # total exchanges net of reuse: also catches SinglePartition /
    # Broadcast exchanges the specific spellings above would miss
    # (code-review r13 — the coalesce(1)/broadcast creep pathology)
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1, plan
    join_nodes = [n for n in (
        "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct") if n in plan]
    assert join_nodes == [], (join_nodes, plan)


def test_fold_dedups_duplicates_without_merge_distinct(spark, tmp_path):
    """The r16 fold skips the union.distinct() exchange because the
    dominance prune's per-user collect_SET collapses the same
    duplicates (_MERGE_DISTINCT = False).  Feed exact duplicate rows
    inside one batch AND re-send state rows in the next: the state
    value rows must come out set-distinct and the score must equal the
    batch kernel over the unique union — the exact contract the
    distinct used to provide."""
    dup_b1 = [
        (1, "view", _t(0)), (1, "view", _t(0)), (1, "view", _t(0)),
        (1, "click", _t(2)), (1, "click", _t(2)),
        (2, "view", _t(1)),
    ]
    dup_b2 = [
        (1, "view", _t(0)),          # re-sends a state row verbatim
        (1, "purchase", _t(5)), (1, "purchase", _t(5)),
        (2, "view", _t(1)),          # duplicate of its own B1 row
    ]
    mon = FunnelMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, dup_b1), epoch_id=0)
    mon.process_batch(spark, _events(spark, dup_b2), epoch_id=1)
    state = [(r["user_id"], r["event_type"], r["ts_us"])
             for r in mon.state_rows(spark).collect()]
    assert len(state) == len(set(state)), state
    expect = _batch_ground_truth(
        spark, tmp_path, list(dict.fromkeys(dup_b1 + dup_b2)))
    assert _rows(mon.scored(spark)) == _rows(expect)
