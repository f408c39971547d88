"""Measured streaming-state bounds (VERDICT r10 task 6).

STREAMSTATE.md records state rows/bytes vs ingested volume for all
eight monitors at two volumes (tools/stream_state_probe.py).  This
test asserts the HARD bounds for the three user-keyed monitors at a
pytest-sized volume of the same synthetic shape, so the production
caps (compact / expire_before) are enforced numerically, not just
argued:

  * funnel: after compact(watermark covering everything), <= 1 row per
    (user, stage) — and converting users hold exactly their gate rows;
  * engagement: state == the distinct (user, day) frame exactly, and
    after expire_before(horizon) every row is >= horizon - 6 days;
  * cohort: after expire_before, each user keeps their cohort row and
    only horizon-relevant weeks — <= #users + horizon user-weeks.
"""

from __future__ import annotations

import sys
from datetime import timedelta, timezone
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from stream_state_probe import (  # noqa: E402
    _EVENTS_SCHEMA, BASE, N_DAYS, STAGES, gen_events,
)

VOL = 2_000
POOL = 500  # stream_state_probe.N_USERS


def _ingest(spark, mon, n=VOL, batches=2):
    rng = np.random.RandomState(11)
    rows = gen_events(rng, n)
    per = len(rows) // batches
    for b in range(batches):
        chunk = (rows[b * per:(b + 1) * per] if b < batches - 1
                 else rows[(batches - 1) * per:])
        mon.process_batch(spark, spark.createDataFrame(chunk, _EVENTS_SCHEMA),
                          epoch_id=b)
    return rows


def test_funnel_compact_bound(spark, tmp_path):
    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.streaming.funnel_monitor import FunnelMonitor

    mon = FunnelMonitor(str(tmp_path / "m"))
    rows = _ingest(spark, mon)
    users = {r[2] for r in rows}
    pre = mon.state_rows(spark).count()

    wm_us = int((BASE + timedelta(days=N_DAYS))
                .replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    mon.compact(spark, wm_us)
    state = mon.state_rows(spark)
    post = state.count()
    assert post < pre
    # the production bound: <= 1 row per (user, stage)
    assert post <= len(users) * len(STAGES)
    per_cell = (state.groupBy("user_id", "event_type").count()
                .agg(F.max("count")).first()[0])
    assert per_cell == 1


def test_engagement_state_is_exact_distinct_frame_and_expiry_caps(
        spark, tmp_path):
    from debezium_nats_cdc_spark.streaming.engagement_monitor import (
        EngagementMonitor,
    )

    mon = EngagementMonitor(str(tmp_path / "m"))
    rows = _ingest(spark, mon)
    distinct_ud = {(r[2], r[1].date()) for r in rows}
    state = {(r.user_id, r.event_day)
             for r in mon.state_rows(spark).collect()}
    assert state == distinct_ud          # the information floor, exactly
    assert len(state) <= POOL * N_DAYS   # pool saturation bound

    horizon = (BASE + timedelta(days=N_DAYS - 7)).date()
    mon.expire_before(spark, horizon.isoformat())
    kept = mon.state_rows(spark).collect()
    cutoff = horizon - timedelta(days=6)
    assert all(r.event_day >= cutoff for r in kept)
    assert {(r.user_id, r.event_day) for r in kept} == \
        {ud for ud in distinct_ud if ud[1] >= cutoff}


def test_cohort_expiry_bound(spark, tmp_path):
    from debezium_nats_cdc_spark.streaming.cohort_monitor import CohortMonitor

    mon = CohortMonitor(str(tmp_path / "m"))
    rows = _ingest(spark, mon)
    users = {r[2] for r in rows}
    pre = mon.state_rows(spark).count()

    wm_us = int((BASE + timedelta(days=N_DAYS))
                .replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    hdate = BASE + timedelta(days=N_DAYS - 7)
    monday = (hdate - timedelta(days=hdate.weekday())).date()
    mon.expire_before(spark, monday.isoformat(), wm_us)
    kept = mon.state_rows(spark).collect()
    assert len(kept) <= pre
    # bound: one frozen cohort row per user + weeks >= horizon
    n_weeks_horizon = 2  # monday covers the final <=2 event weeks
    assert len(kept) <= len(users) * (1 + n_weeks_horizon)
    # every user still carries a row (the cohort assignment floor)
    assert {r.user_id for r in kept} == users
    # and whatever was dropped was a frozen mid-range week
    by_user: dict = {}
    for r in kept:
        by_user.setdefault(r.user_id, []).append(r.wk)
    full = {}
    for r in rows:
        wkd = r[1].date() - timedelta(days=r[1].weekday())
        full.setdefault(r[2], set()).add(wkd)
    for u, wks in by_user.items():
        assert min(wks) == min(full[u])  # cohort row preserved
        assert set(wks) >= {w for w in full[u] if w >= monday}
