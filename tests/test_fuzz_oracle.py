"""Differential-fuzzing gate: seed-0 random dirty tables through every
oracle-backed catalog query on BOTH engines, strict-canonicalized
compare.  This is the CI pin of tools/fuzz_oracle.py — extra seeds run
from the CLI.  The known-failures allowlist is enforced in both
directions: an unknown divergence fails, and an allowlisted one that
stops reproducing fails too (stale debt entry).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_every_oracle_matches_on_seed0_fuzz_tables(spark):
    import fuzz_oracle

    fails = fuzz_oracle.run_seed(spark, seed=0)
    unknown = [q for q in fails if q not in fuzz_oracle.KNOWN_FAILURES]
    assert not unknown, f"fuzz divergences not in KNOWN_FAILURES: {unknown}"
    stale = [q for q in fuzz_oracle.KNOWN_FAILURES if q not in fails]
    assert not stale, (
        f"KNOWN_FAILURES entries no longer reproduce — prune them: {stale}")


def test_every_oracle_matches_on_empty_fact_tables(spark):
    """Fresh-deployment scenario: zero-row fact tables, populated dims.
    Every query must execute (no stage-killing exception on an empty
    relation) and agree with its oracle, modulo the documented
    EMPTY_KNOWN_FAILURES (enforced fresh in both directions)."""
    import fuzz_oracle

    fails = fuzz_oracle.run_seed(spark, seed=0, empty_facts=True)
    unknown = [q for q in fails
               if q not in fuzz_oracle.EMPTY_KNOWN_FAILURES]
    assert not unknown, f"empty-facts divergences: {unknown}"
    stale = [q for q in fuzz_oracle.EMPTY_KNOWN_FAILURES if q not in fails]
    assert not stale, f"EMPTY_KNOWN_FAILURES no longer reproduce: {stale}"


def test_event_queries_match_on_nanos_encoded_timestamps(spark):
    """events.ts as parquet TIMESTAMP(NANOS) — the r1-era driver-data
    encoding that Spark's vectorized reader rejects outright.  This
    exercises io.load_table's nanosAsLong bigint -> timestamp_micros
    conversion (integer `div 1000`, matching DuckDB's ns cast) end to
    end against the oracles; the path is dormant on current testdata
    (all SFs ship microseconds) but must keep working."""
    import fuzz_oracle

    ev_queries = [
        "window_latest_state_per_key", "cdc_retention_filter",
        "stats_key_skew_report", "window_state_as_of",
        "agg_daily_event_volume", "window_lag_timeline",
        "cdc_tumbling_window", "join_event_correlation",
    ]
    fails = fuzz_oracle.run_seed(spark, seed=0, only=ev_queries,
                                 ns_events=True)
    assert not fails, f"ns-timestamp divergences: {fails}"
