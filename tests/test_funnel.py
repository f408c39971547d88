"""Hand-computed fixtures for the r9 event-sequence analytics operators
(operators/funnel.py): strict-order funnel conversion and weekly cohort
retention.

Value parity vs DuckDB is covered by the driver oracle + strict sweep;
these pin the SEMANTICS to numbers computed by hand — in particular the
strictness edges (an out-of-order purchase must NOT count; an
equal-timestamp next stage must NOT count) and the week-dedup /
cohort-denominator rules.
"""

from __future__ import annotations

from datetime import datetime

from debezium_nats_cdc_spark.operators.funnel import (
    events_cohort_retention,
    events_funnel_conversion,
)

_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
           "event_type string, value double, props string")


def _write_events(spark, tmp_path, rows):
    data = [(i, ts, u, et, None, None)
            for i, (u, et, ts) in enumerate(rows)]
    (spark.createDataFrame(data, _SCHEMA)
          .write.mode("overwrite")
          .parquet(f"{tmp_path}/events.parquet"))
    return str(tmp_path)


def _t(day, h, m=0):
    return datetime(2024, 1, day, h, m)


def test_funnel_strict_ordering_hand_computed(spark, tmp_path):
    sf = _write_events(spark, tmp_path, [
        # u1: clean full funnel — click +300s after view, purchase
        # +1500s after the qualifying click
        (1, "view",     _t(2, 10, 0)),
        (1, "click",    _t(2, 10, 5)),
        (1, "purchase", _t(2, 10, 30)),
        # u2: click BEFORE the first view must not gate; the purchase
        # at 09:40 precedes the qualifying click (09:45) so u2 stops at
        # stage 2 with a +900s delay
        (2, "click",    _t(2, 9, 0)),
        (2, "view",     _t(2, 9, 30)),
        (2, "purchase", _t(2, 9, 40)),
        (2, "click",    _t(2, 9, 45)),
        # u3: view only
        (3, "view",     _t(2, 8, 0)),
        # u4: click+purchase but NO view — not in the funnel at all
        (4, "click",    _t(2, 8, 0)),
        (4, "purchase", _t(2, 8, 10)),
        # u5: click at the SAME instant as the view — strictly-after
        # fails, stage 1 only
        (5, "view",     _t(2, 12, 0)),
        (5, "click",    _t(2, 12, 0)),
        # dirty rows: NULL user / NULL ts are excluded
        (None, "view",  _t(2, 7, 0)),
        (6, "view",     None),
    ])
    rows = {r.stage: r for r in events_funnel_conversion(spark, sf).collect()}

    assert rows[1].event_type == "view"
    assert rows[1].n_users == 4            # u1, u2, u3, u5
    assert rows[1].avg_secs_from_prev is None

    assert rows[2].event_type == "click"
    assert rows[2].n_users == 2            # u1 (+300s), u2 (+900s)
    assert rows[2].avg_secs_from_prev == 600.0

    assert rows[3].event_type == "purchase"
    assert rows[3].n_users == 1            # u1 only (+1500s)
    assert rows[3].avg_secs_from_prev == 1500.0


def test_funnel_empty_events_still_emits_three_stage_rows(spark, tmp_path):
    sf = _write_events(spark, tmp_path, [])
    rows = {r.stage: r for r in events_funnel_conversion(spark, sf).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(rows[s].n_users == 0 for s in (1, 2, 3))
    assert all(rows[s].avg_secs_from_prev is None for s in (1, 2, 3))


def test_cohort_retention_hand_computed(spark, tmp_path):
    # Weeks (Monday-truncated): wk0=2024-01-01, wk1=01-08, wk2=01-15
    sf = _write_events(spark, tmp_path, [
        # u1: two events inside wk0 (dedup to one active week) + wk1
        (1, "view",  _t(2, 10)),
        (1, "click", _t(3, 11)),
        (1, "view",  _t(9, 10)),
        # u2: wk0 and wk2 (skips wk1)
        (2, "view",  _t(3, 9)),
        (2, "view",  _t(16, 9)),
        # u3: first seen wk1, active wk1+wk2
        (3, "click", _t(10, 9)),
        (3, "view",  _t(17, 9)),
        # u4: wk2 only
        (4, "view",  _t(18, 9)),
        # dirty rows excluded
        (None, "view", _t(2, 9)),
        (5, "view",  None),
    ])
    got = {(r.cohort_week, r.offset_weeks): r
           for r in events_cohort_retention(spark, sf).collect()}

    expect = {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 1): (1, 2, 0.5),
        ("2024-01-01", 2): (1, 2, 0.5),
        ("2024-01-08", 0): (1, 1, 1.0),
        ("2024-01-08", 1): (1, 1, 1.0),
        ("2024-01-15", 0): (1, 1, 1.0),
    }
    assert set(got) == set(expect)
    for k, (n_active, size, pct) in expect.items():
        assert got[k].n_active == n_active, k
        assert got[k].cohort_size == size, k
        assert got[k].retained_pct == pct, k
