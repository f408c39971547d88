"""The bench summary line must survive the driver's 2000-char stdout tail.

BENCH_r05's artifact proved the window is exactly 2000 chars and that a
2284-char summary line loses its head: 7 query timings vanished and the
driver's JSON parse returned None.  These tests pin, without a Spark
session, that the abbreviated summary for the FULL current catalog fits
the budget under adverse value widths, parses back, and keeps one
distinct key per query.
"""

from __future__ import annotations

import json

import bench
from debezium_nats_cdc_spark import catalog


def _names() -> list[str]:
    return list(catalog.entries().keys())


def test_summary_fits_tail_budget_at_adverse_values():
    names = _names()
    # adverse-but-plausible: every query at 12.3 s (sum 900 s), ambient
    # meltdown shape; plus realistic stream stats widths
    timings = {n: 12.345 for n in names}
    stream = {
        "stream_events_per_sec": 123456.7,
        "stream_batch_p50_sec": 11.622,
        "stream_batch_p95_sec": 11.854,
        "stream_wall_sec": 99.999,  # must NOT be copied into the summary
    }
    line = bench.build_summary(timings, "0.1", stream)
    assert len(line) + 1 <= 2000, f"summary {len(line)} chars + newline > tail"
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(names)
    assert "stream_wall_sec" not in parsed


def test_summary_round_trips_and_orders_slowest_last():
    names = _names()
    timings = {n: 0.1 + i * 0.01 for i, n in enumerate(names)}
    timings[names[0]] = 50.0  # slowest
    line = bench.build_summary(timings, "0.1", {})
    parsed = json.loads(line)
    assert list(parsed["queries"].values())[-1] == 50.0
    assert parsed["metric"] == "catalog_total_sec"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert "n_failed" not in parsed  # only present when something failed


def test_abbreviation_is_injective_over_catalog():
    names = _names()
    short = bench.abbr_map(names)
    assert len(set(short.values())) == len(names)
    # the family prefix swap is preserved so artifacts group by family
    for n, s in short.items():
        for long, sh in bench.ABBR:
            if n.startswith(long):
                assert s.startswith(sh)
    # deterministic: rebuilding the map from catalog names reproduces the
    # artifact keys (this is how per-round artifacts join without the
    # legend line surviving the driver tail)
    assert short == bench.abbr_map(names)


def test_every_timing_keeps_two_decimal_resolution():
    """r6's artifact recorded 60/81 queries as integer '0' (the summary
    fell to the whole-seconds fallback tier): with realistic sub-second
    values across the full catalog the PRIMARY tier must fit the tail
    and keep 2-decimal floats for every query (VERDICT r6 #3)."""
    names = _names()
    timings = {n: 0.1234 + (i % 7) * 0.3 for i, n in enumerate(names)}
    stream = {
        "stream_events_per_sec": 123456.7,
        "stream_batch_p50_sec": 1.622,
        "stream_batch_p95_sec": 1.854,
    }
    line = bench.build_summary(timings, "0.1", stream)
    assert len(line) + 1 <= 2000
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(names)
    for k, v in parsed["queries"].items():
        assert isinstance(v, float) and v == round(v, 2), (k, v)
        assert v >= 0.1  # 2-decimal floor: nothing collapsed to 0


def test_meltdown_drop_skips_failure_markers():
    """The over-budget drop loop pops ascending — and -1.0 failure
    markers sort first.  They must be skipped, not discarded, so a
    failed query stays identifiable in the artifact (ADVICE r6)."""
    names = _names()
    timings = {n: 123.456 + i for i, n in enumerate(names)}
    timings[names[5]] = -1.0
    line = bench.build_summary(timings, "1", {})
    assert len(line) + 1 <= 2000
    parsed = json.loads(line)
    if parsed.get("n_omitted"):
        short = bench.abbr_map(names)
        assert parsed["queries"][short[names[5]]] == -1.0
        assert parsed["n_failed"] == 1


def test_failed_query_is_flagged_not_dropped():
    names = _names()
    timings = {n: 0.5 for n in names}
    timings[names[3]] = -1.0
    line = bench.build_summary(timings, "0.1", {})
    parsed = json.loads(line)
    assert parsed["n_failed"] == 1
    assert parsed["queries"][bench.abbr_name(names[3])] == -1.0


def test_summary_meltdown_drops_fastest_and_reports_omissions():
    """3-digit timings across the whole catalog can exceed the tail
    budget even at whole-second precision: the summary must then drop
    the FASTEST queries (slow tail survives for the plan audit) and
    report n_omitted — never emit an over-budget line."""
    names = _names()
    timings = {n: 123.456 + i for i, n in enumerate(names)}
    line = bench.build_summary(timings, "1", {})
    assert len(line) + 1 <= 2000
    parsed = json.loads(line)
    kept = parsed["queries"]
    assert len(kept) + parsed.get("n_omitted", 0) == len(names)
    if parsed.get("n_omitted"):
        # the slowest query is always retained (slowest-last ordering)
        slowest = bench.abbr_name(max(timings, key=timings.get))
        assert list(kept)[-1] == slowest
