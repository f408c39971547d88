"""CohortMonitor (VERDICT r10 task 7): incremental distinct-(user,
week) state scored into the cohort matrix == batch recompute over
everything ingested after EVERY batch — including a late first-activity
event that moves a user's cohort week DOWN and re-bases every cell the
user touches; replay idempotence; fresh-checkpoint epoch reset; the
expire_before production bound keeps published cells + the offset-0
diagonal exact while shrinking state.
"""

from __future__ import annotations

from datetime import datetime, timezone

from debezium_nats_cdc_spark.operators.funnel import events_cohort_retention
from debezium_nats_cdc_spark.streaming.cohort_monitor import CohortMonitor

_EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                  "event_type string, value double, props string")


def _events(spark, rows):
    data = [(i, ts, uid, "click", None, None)
            for i, (uid, ts) in enumerate(rows)]
    return spark.createDataFrame(data, _EVENTS_SCHEMA)


def _d(day, month=1, hour=12):
    return datetime(2024, month, day, hour, 0)


def _rows(df):
    return sorted(map(tuple, df.collect()))


# Mondays in Jan-Feb 2024: Jan 1, 8, 15, 22, 29, Feb 5.
# B1: users 1,2 start week Jan 8; user 3 starts week Jan 15.
# B2: retention activity weeks Jan 15/22.
# B3: LATE event — user 2 turns out to have been active Jan 1 week:
#     their cohort moves DOWN a week, shrinking the Jan-8 cohort and
#     re-basing every user-2 cell.  Plus NULL user/ts noise.
B1 = [(1, _d(9)), (2, _d(10)), (1, _d(11, hour=3)), (3, _d(16))]
B2 = [(1, _d(17)), (2, _d(23)), (3, _d(24))]
B3 = [(2, _d(2)), (None, _d(3)), (7, None), (1, _d(30))]


def _truth(spark, tmp_path, all_rows):
    (_events(spark, all_rows).write.mode("overwrite")
     .parquet(f"{tmp_path}/events.parquet"))
    return events_cohort_retention(spark, str(tmp_path))


def test_incremental_equals_batch_after_every_batch(spark, tmp_path):
    mon = CohortMonitor(str(tmp_path / "mon"))
    seen: list = []
    for i, b in enumerate([B1, B2, B3]):
        mon.process_batch(spark, _events(spark, b), epoch_id=i)
        seen += b
        expect = _truth(spark, tmp_path / f"truth{i}", seen)
        assert _rows(mon.scored(spark)) == _rows(expect), f"batch {i}"
    # the late Jan-1-week event re-based user 2: Jan-8 cohort is now
    # just user 1, and user 2 anchors a new Jan-1 cohort
    got = {(r.cohort_week, r.offset_weeks): (r.n_active, r.cohort_size)
           for r in mon.scored(spark).collect()}
    assert got[("2024-01-08", 0)] == (1, 1)   # user 1 only
    assert got[("2024-01-01", 0)] == (1, 1)   # user 2 re-based
    assert got[("2024-01-01", 3)] == (1, 1)   # user 2 @ Jan 22 wk
    assert got[("2024-01-15", 0)] == (1, 1)   # user 3


def test_replay_and_adhoc_double_fold_are_noops(spark, tmp_path):
    mon = CohortMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)
    before = _rows(mon.state_rows(spark))
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)  # replay
    assert _rows(mon.state_rows(spark)) == before
    # ad-hoc double fold (no epoch id): distinct merge is idempotent
    mon.process_batch(spark, _events(spark, B1))
    assert _rows(mon.state_rows(spark)) == before


def test_streaming_entrypoint_and_fresh_checkpoint(spark, tmp_path):
    """ad-hoc folds at high epochs, then a FRESH-checkpoint stream
    (epoch ids restart at 0): the guard must reset so the stream keeps
    folding into the accumulated state instead of skipping batches —
    the same _ingest_base half-reset contract as the sibling monitors."""
    root = str(tmp_path / "mon")
    mon = CohortMonitor(root)
    mon.process_batch(spark, _events(spark, B1), epoch_id=40)
    mon.process_batch(spark, _events(spark, B2), epoch_id=41)
    src = tmp_path / "src"
    src.mkdir()
    _events(spark, B3).coalesce(1).write.parquet(f"{src}/f0")
    mon2 = CohortMonitor(root)
    stream = (spark.readStream.schema(_EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/f*"))
    mon2.start(spark, stream).awaitTermination()
    expect = _truth(spark, tmp_path / "truth", B1 + B2 + B3)
    assert _rows(mon2.scored(spark)) == _rows(expect)
    assert mon2.last_epoch(spark) == 0  # fresh checkpoint sequence


def test_expire_before_bounds_state_and_keeps_published_cells_exact(
        spark, tmp_path):
    """Horizon expiry: frozen users' mid-range weeks drop, the cohort
    row and horizon weeks stay, and every published cell (active week
    >= horizon) plus the whole offset-0 diagonal still equals batch —
    including after further ingest respecting the watermark."""
    # user 20: active every week Jan 1 .. Feb 5 (6 weeks)
    # user 21: active Jan 1 week only (never returns)
    rows = [(20, _d(1)), (20, _d(8)), (20, _d(15)), (20, _d(22)),
            (20, _d(29)), (20, _d(5, month=2)),
            (21, _d(2))]
    mon = CohortMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, rows), epoch_id=0)
    pre = mon.state_rows(spark).count()
    assert pre == 7

    wm_us = int(_d(5, month=2).replace(tzinfo=timezone.utc)
                .timestamp() * 1_000_000)
    mon.expire_before(spark, "2024-01-29", wm_us)
    post = mon.state_rows(spark)
    # user 20 keeps cohort row (Jan 1) + Jan 29 + Feb 5; Jan 8/15/22
    # dropped.  user 21 keeps only its cohort row.
    assert post.count() == 4
    assert _rows(post) == sorted([
        (20, datetime(2024, 1, 1).date()),
        (20, datetime(2024, 1, 29).date()),
        (20, datetime(2024, 2, 5).date()),
        (21, datetime(2024, 1, 1).date()),
    ])

    def published_and_diagonal(df):
        out = []
        for r in df.collect():
            active_wk = (datetime.strptime(r.cohort_week, "%Y-%m-%d")
                         .date().toordinal() + 7 * r.offset_weeks)
            if r.offset_weeks == 0 or \
                    active_wk >= datetime(2024, 1, 29).date().toordinal():
                out.append(tuple(r))
        return sorted(out)

    expect = _truth(spark, tmp_path / "truth", rows)
    assert published_and_diagonal(mon.scored(spark)) == \
        published_and_diagonal(expect)

    # further ingest >= watermark: user 21 returns after 6 weeks, a new
    # user 22 starts — published cells must still match batch exactly
    late = [(21, _d(12, month=2)), (22, _d(13, month=2))]
    mon.process_batch(spark, _events(spark, late), epoch_id=1)
    expect2 = _truth(spark, tmp_path / "truth2", rows + late)
    assert published_and_diagonal(mon.scored(spark)) == \
        published_and_diagonal(expect2)
