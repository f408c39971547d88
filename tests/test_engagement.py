"""events_dau_wau (operators/engagement.py) hand-computed fixture +
EngagementMonitor: incremental distinct-(user, day) state scored by the
shared kernel == batch recompute over everything ingested; late-data
correction; replay idempotence; fresh-checkpoint epoch reset.
"""

from __future__ import annotations

from datetime import datetime

from debezium_nats_cdc_spark.operators.engagement import events_dau_wau
from debezium_nats_cdc_spark.streaming.engagement_monitor import (
    EngagementMonitor,
)

_EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                  "event_type string, value double, props string")


def _events(spark, rows):
    data = [(i, ts, uid, "click", None, None)
            for i, (uid, ts) in enumerate(rows)]
    return spark.createDataFrame(data, _EVENTS_SCHEMA)


def _d(day, hour=12):
    return datetime(2024, 1, day, hour, 0)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dau_wau_hand_fixture(spark, tmp_path):
    """Jan 1: users {1,2}; Jan 2: {1}; Jan 9: {2,3}.  WAU(Jan 2) counts
    both days' users; WAU(Jan 9) sees only Jan 9 (Jan 1-2 are > 6 days
    back).  Duplicate same-day events and NULL user/ts rows must not
    inflate anything."""
    rows = [(1, _d(1)), (2, _d(1)), (1, _d(1, 15)),   # dup same-day
            (1, _d(2)),
            (2, _d(9)), (3, _d(9)),
            (None, _d(1)), (4, None)]
    (_events(spark, rows).write.mode("overwrite")
     .parquet(f"{tmp_path}/events.parquet"))
    got = {r.event_day: (r.dau, r.wau, r.stickiness)
           for r in events_dau_wau(spark, str(tmp_path)).collect()}
    assert got == {
        "2024-01-01": (2, 2, 1.0),
        "2024-01-02": (1, 2, 0.5),
        "2024-01-09": (2, 2, 1.0),
    }


# three micro-batches; B3 carries a LATE event for Jan 2 that must lift
# WAU on Jan 2..8's observed days retroactively
B1 = [(1, _d(1)), (2, _d(1)), (1, _d(2))]
B2 = [(2, _d(5)), (3, _d(5)), (1, _d(5))]
B3 = [(9, _d(2)), (3, _d(10)), (None, _d(3)), (5, None)]


def _truth(spark, tmp_path, all_rows):
    (_events(spark, all_rows).write.mode("overwrite")
     .parquet(f"{tmp_path}/events.parquet"))
    return events_dau_wau(spark, str(tmp_path))


def test_incremental_equals_batch_after_every_batch(spark, tmp_path):
    mon = EngagementMonitor(str(tmp_path / "mon"))
    seen: list = []
    for i, b in enumerate([B1, B2, B3]):
        mon.process_batch(spark, _events(spark, b), epoch_id=i)
        seen += b
        expect = _truth(spark, tmp_path / f"truth{i}", seen)
        assert _rows(mon.scored(spark)) == _rows(expect), f"batch {i}"
    # the late Jan-2 user lifted WAU for Jan 5 (trailing window covers
    # Jan 1, 2, 5): distinct {1, 2} ∪ {1, 9(late)} ∪ {1, 2, 3} = 4
    wau5 = {r.event_day: r.wau for r in mon.scored(spark).collect()}
    assert wau5["2024-01-05"] == 4


def test_replay_and_adhoc_double_fold_are_noops(spark, tmp_path):
    mon = EngagementMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)
    snap = _rows(mon.state_rows(spark))
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)  # replay
    mon.process_batch(spark, _events(spark, B1))  # ad-hoc re-fold
    assert _rows(mon.state_rows(spark)) == snap  # distinct union: no-op
    assert mon.last_epoch(spark) == 1


def test_streaming_entrypoint_and_fresh_checkpoint(spark, tmp_path):
    root = str(tmp_path / "mon")
    mon = EngagementMonitor(root)
    mon.process_batch(spark, _events(spark, B1), epoch_id=40)
    mon.process_batch(spark, _events(spark, B2), epoch_id=41)
    src = tmp_path / "src"
    src.mkdir()
    _events(spark, B3).coalesce(1).write.parquet(f"{src}/f0")
    mon2 = EngagementMonitor(root)
    stream = (spark.readStream.schema(_EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/f*"))
    mon2.start(spark, stream).awaitTermination()
    expect = _truth(spark, tmp_path / "truth", B1 + B2 + B3)
    assert _rows(mon2.scored(spark)) == _rows(expect)
    assert mon2.last_epoch(spark) == 0  # fresh checkpoint sequence


def test_expire_before_bounds_state_and_keeps_published_days_exact(
        spark, tmp_path):
    """Reporting-horizon expiry: rows older than horizon − 6 days drop;
    every published day (>= horizon) still scores exactly as the batch
    kernel over the full history."""
    from datetime import date

    rows = ([(u, _d(1)) for u in (1, 2, 3)]
            + [(u, _d(5)) for u in (1, 4)]
            + [(u, _d(12)) for u in (2, 5)]
            + [(1, _d(15))])
    mon = EngagementMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, rows), epoch_id=0)
    pre = mon.state_rows(spark).count()

    horizon = "2024-01-12"  # publish days >= Jan 12; cutoff = Jan 6
    mon.expire_before(spark, horizon)
    post = mon.state_rows(spark)
    assert post.count() < pre
    # Jan 1 and Jan 5 rows (all < Jan 6) are gone
    assert post.filter("event_day < DATE'2024-01-06'").count() == 0

    truth = {r.event_day: (r.dau, r.wau, r.stickiness)
             for r in _truth(spark, tmp_path / "truth", rows).collect()
             if r.event_day >= horizon}
    got = {r.event_day: (r.dau, r.wau, r.stickiness)
           for r in mon.scored(spark).collect()
           if r.event_day >= horizon}
    assert got == truth and len(truth) == 2  # Jan 12, Jan 15 published
    # late data for a published day still folds and corrects it
    mon.process_batch(spark, _events(spark, [(9, _d(12))]), epoch_id=1)
    assert {r.dau for r in mon.scored(spark).collect()
            if r.event_day == "2024-01-12"} == {3}


def test_monitor_casts_configurable_user_col(spark, tmp_path):
    """ADVICE r10 regression: a non-bigint user column (numeric-string
    ids here) must cast explicitly to the state schema's bigint in
    process_batch — mirroring FunnelMonitor._batch_rows — instead of
    failing or mis-coercing at unionByName against the parquet state."""
    mon = EngagementMonitor(str(tmp_path / "mon"), user_col="uid")
    df1 = spark.createDataFrame(
        [("1", _d(1)), ("2", _d(1)), ("1", _d(2))],
        "uid string, ts timestamp_ntz")
    df2 = spark.createDataFrame(
        [("2", _d(2)), ("3", _d(2))], "uid string, ts timestamp_ntz")
    mon.process_batch(spark, df1, epoch_id=0)
    mon.process_batch(spark, df2, epoch_id=1)  # merges into parquet state
    got = {r.event_day: (r.dau, r.wau) for r in mon.scored(spark).collect()}
    assert got == {"2024-01-01": (2, 2), "2024-01-02": (3, 3)}
    # state really is bigint-typed, both batches folded
    state = mon.state_rows(spark)
    assert dict(state.dtypes)["user_id"] == "bigint"
    assert state.count() == 5


def test_approx_tier_envelope_property(spark, tmp_path):
    """events_dau_wau_approx (VERDICT r10 #5): on randomized event
    frames the sketch estimates stay inside the 20% envelope (4-sigma
    at the ~1.6% rsd of both engines' HLL defaults) and the exact
    columns equal the exact tier's — the same semantic cross-engine
    contract agg_approx_distinct pins.  Deterministic seeds, three
    regimes: sparse days, heavy-dup users, single-day spike."""
    import random

    from debezium_nats_cdc_spark.operators.engagement import (
        events_dau_wau_approx,
    )

    for seed, n_users, n_days, n_rows in [(7, 40, 12, 400),
                                          (11, 300, 3, 900),
                                          (13, 25, 1, 200)]:
        rng = random.Random(seed)
        rows = [(rng.randrange(1, n_users + 1),
                 _d(1 + rng.randrange(n_days),
                    hour=1 + rng.randrange(20)))
                for _ in range(n_rows)]
        d = tmp_path / f"sf{seed}"
        (_events(spark, rows).write.mode("overwrite")
         .parquet(f"{d}/events.parquet"))
        approx = events_dau_wau_approx(spark, str(d)).collect()
        exact = {r.event_day: (r.dau, r.wau)
                 for r in events_dau_wau(spark, str(d)).collect()}
        assert len(approx) == len(exact) > 0
        for r in approx:
            assert (r.dau, r.wau) == exact[r.event_day], r.event_day
            assert r.dau_within_20pct and r.wau_within_20pct, r


def test_handoff_guard_fires_above_threshold_silent_below(
        spark, tmp_path):
    """VERDICT r14 task 3: the measured exact-vs-sketch crossover
    (5.68x vs 1.48x per-fold wall at 100x users, SCALING.md r14) wired
    into the monitor as a state-size guard — silent below the
    threshold, a documented handoff warning on the alerts channel
    above it, polled from parquet footers (no Spark job) after every
    fold."""
    mon = EngagementMonitor(str(tmp_path / "mon"), handoff_state_rows=4)
    # B1 folds to 3 distinct (user, day) rows: below 4 -> silent
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)
    assert mon.alerts == []
    assert mon.last_handoff == {"state_rows": 3, "threshold": 4,
                                "handoff_advised": False}
    # B2 lifts it to 6 > 4 -> exactly one warning, report updated
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)
    assert mon.last_handoff["state_rows"] == 6
    assert mon.last_handoff["handoff_advised"] is True
    assert len(mon.alerts) == 1
    assert "approx_engagement_monitor" in mon.alerts[0]
    assert "expire_before" in mon.alerts[0]
    # edge-triggered (code-review r15): a further fold that STAYS
    # above the threshold reports the advice but does not append a
    # duplicate alert — the channel records crossings, not folds
    mon.process_batch(spark, _events(spark, B3), epoch_id=2)
    assert mon.last_handoff["handoff_advised"] is True
    assert "warning" in mon.last_handoff
    assert len(mon.alerts) == 1
    # the guard never perturbs the scored result
    expect = _truth(spark, tmp_path / "truth", B1 + B2 + B3)
    assert _rows(mon.scored(spark)) == _rows(expect)
    # standalone poll with an explicit threshold overrides the default
    rep = mon.maybe_handoff(spark, max_state_rows=100)
    assert rep == {"state_rows": 8, "threshold": 100,
                   "handoff_advised": False}


def test_handoff_guard_default_threshold_is_documented_and_silent(
        spark, tmp_path):
    """The default threshold sits a decade inside OPERATIONS.md §9's
    low-billions cutover prose, so ordinary volumes never warn; a
    fresh monitor polls 0 rows without a state table."""
    mon = EngagementMonitor(str(tmp_path / "mon"))
    assert mon.handoff_state_rows == 1_000_000_000
    rep = mon.maybe_handoff(spark)
    assert rep == {"state_rows": 0,
                   "threshold": 1_000_000_000,
                   "handoff_advised": False}
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)
    assert mon.alerts == []


def test_handoff_guard_none_disables_the_per_fold_poll(
        spark, tmp_path):
    """code-review r15: None must genuinely disable the guard (the
    default comes from a distinct sentinel) — no poll, no report, no
    footer reads after folds."""
    mon = EngagementMonitor(str(tmp_path / "mon"),
                            handoff_state_rows=None)
    assert mon.handoff_state_rows is None
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)
    assert mon.last_handoff is None and mon.alerts == []
    # an explicit standalone poll still works (threshold None -> never
    # advised) and records its report
    rep = mon.maybe_handoff(spark)
    assert rep["handoff_advised"] is False and rep["state_rows"] == 3


def test_handoff_edge_state_immune_to_adhoc_polls(spark, tmp_path):
    """code-review r15 pass 2: the alert edge is scoped to the
    CONFIGURED threshold.  An ad-hoc explicit-threshold poll is
    report-only — it must neither swallow the next genuine crossing
    (old bug: a tighter ad-hoc poll set last_handoff advised=True and
    the real crossing never alerted) nor re-arm a duplicate (old bug:
    a looser ad-hoc poll reset the edge while state stayed above)."""
    mon = EngagementMonitor(str(tmp_path / "mon"), handoff_state_rows=4)
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)  # 3 rows
    # tighter ad-hoc poll: advised in the REPORT, but no alert and no
    # edge arming
    rep = mon.maybe_handoff(spark, max_state_rows=2)
    assert rep["handoff_advised"] is True and "warning" in rep
    assert mon.alerts == []
    # the genuine crossing of the configured threshold still alerts
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)  # 6 > 4
    assert len(mon.alerts) == 1
    # looser ad-hoc poll while above: must not reset the edge...
    rep = mon.maybe_handoff(spark, max_state_rows=100)
    assert rep["handoff_advised"] is False
    # ...so the next fold (still above) does not append a duplicate
    mon.process_batch(spark, _events(spark, B3), epoch_id=2)  # 8 > 4
    assert len(mon.alerts) == 1
