"""ApproxEngagementMonitor: per-day HLL sketch state — estimates track
the exact tier, replay/re-fold idempotency at register level, state
bounded by #days (not user-days), reporting-horizon expiry.

At these fixture cardinalities (< a few hundred distinct users) the
DataSketches HLL sketch is still in its exact sparse mode, so the
estimate EQUALS the exact count — the tests assert equality, which is
sharper than the 20% envelope and pins that the monitor's collapse
drops no day and double-counts no user.
"""

from __future__ import annotations

from datetime import datetime

from debezium_nats_cdc_spark.streaming.approx_engagement_monitor import (
    ApproxEngagementMonitor,
)
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


B1 = [(1, _d(1)), (2, _d(1)), (1, _d(2))]
B2 = [(2, _d(5)), (3, _d(5)), (1, _d(5))]
B3 = [(9, _d(2)), (3, _d(10)), (None, _d(3)), (5, None)]


def _est(mon, spark):
    return {r.event_day: (r.dau_est, r.wau_est)
            for r in mon.scored(spark).collect()}


def _exact(mon, spark):
    return {r.event_day: (r.dau, r.wau)
            for r in mon.scored(spark).collect()}


def test_estimates_equal_exact_tier_at_sparse_cardinality(spark, tmp_path):
    """After every batch — including the late Jan-2 arrival in B3 that
    must retroactively lift Jan 5's trailing window — the sketch tier's
    (dau_est, wau_est) equals the exact monitor's (dau, wau)."""
    approx = ApproxEngagementMonitor(str(tmp_path / "a"))
    exact = EngagementMonitor(str(tmp_path / "e"))
    for i, b in enumerate([B1, B2, B3]):
        ev = _events(spark, b)
        approx.process_batch(spark, ev, epoch_id=i)
        exact.process_batch(spark, ev, epoch_id=i)
        assert _est(approx, spark) == _exact(exact, spark), f"batch {i}"
    assert _est(approx, spark)["2024-01-05"] == (3, 4)  # late lift seen


def test_replay_and_adhoc_double_fold_are_noops(spark, tmp_path):
    """HLL union is an idempotent register max: a replayed epoch and an
    ad-hoc re-fold of already-ingested events change nothing scored."""
    mon = ApproxEngagementMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)
    snap = _est(mon, spark)
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)  # replay
    mon.process_batch(spark, _events(spark, B1))  # ad-hoc re-fold
    assert _est(mon, spark) == snap
    assert mon.last_epoch(spark) == 1


def test_state_bounded_by_days_not_users(spark, tmp_path):
    """200 users over 3 days: the exact tier's state is the 600-row
    (user, day) frame; the sketch tier holds exactly 3 day rows."""
    rows = [(u, _d(1 + (u % 3))) for u in range(1, 201)]
    mon = ApproxEngagementMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, rows), epoch_id=0)
    assert mon.state_rows(spark).count() == 3
    est = _est(mon, spark)
    # 200 users round-robin over 3 days: 67/67/66 — still sparse-exact
    assert sum(v[0] for v in est.values()) == 200


def test_expire_before_drops_unpublishable_day_sketches(spark, tmp_path):
    mon = ApproxEngagementMonitor(str(tmp_path / "mon"))
    mon.process_batch(
        spark, _events(spark, [(1, _d(1)), (2, _d(8)), (3, _d(15))]),
        epoch_id=0)
    mon.expire_before(spark, "2024-01-14")  # cutoff = Jan 8
    kept = sorted(r.event_day.isoformat()
                  for r in mon.state_rows(spark).collect())
    assert kept == ["2024-01-08", "2024-01-15"]
    assert mon.last_epoch(spark) == 0  # meta row survives expiry


def test_streaming_entrypoint_and_fresh_checkpoint(spark, tmp_path):
    root = str(tmp_path / "mon")
    mon = ApproxEngagementMonitor(root)
    mon.process_batch(spark, _events(spark, B1), epoch_id=40)
    src = tmp_path / "src"
    src.mkdir()
    _events(spark, B2).coalesce(1).write.parquet(f"{src}/f0")
    mon2 = ApproxEngagementMonitor(root)
    stream = (spark.readStream.schema(_EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/f*"))
    mon2.start(spark, stream).awaitTermination()
    exact = EngagementMonitor(str(tmp_path / "e"))
    exact.process_batch(spark, _events(spark, B1 + B2), epoch_id=0)
    assert _est(mon2, spark) == _exact(exact, spark)
    assert mon2.last_epoch(spark) == 0  # fresh checkpoint sequence