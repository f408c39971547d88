"""Decompose micro-batch latency into its Structured Streaming phases.

Runs the same 40x1k-event shape as streaming.bench.microbatch_latency but
keeps the FULL progress records, aggregating P50/P95 for each durationMs
phase (triggerExecution = total; addBatch = foreachBatch body incl. all
sinks; getBatch/latestOffset = source; queryPlanning = incremental plan
re-analysis; walCommit/commitOffsets = offset log; stateUpdate phases
from the dedup operator).  Also times the three sink stages individually
by running process_batch on a representative 1k-row batch with each sink
isolated (events / audit / state) — threads submit concurrently in
production, so per-batch wall ~= max(sink) + fixed overheads.

Usage: python tools/latency_decompose.py
Paste the JSON lines into BENCHLOG.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pctl(vals, p):
    vals = sorted(vals)
    return vals[min(len(vals) - 1, int(len(vals) * p))]


def phase_breakdown(spark) -> None:
    from debezium_nats_cdc_spark.sources import fixtures
    from debezium_nats_cdc_spark.streaming.bench import _synthetic_updates
    from debezium_nats_cdc_spark.streaming.pipeline import (
        PipelineDirs, start_table_pipeline)

    root = tempfile.mkdtemp(prefix="cdc-decomp-")
    try:
        log_dir = os.path.join(root, "log")
        fixtures.write_event_log(_synthetic_updates(40_000), log_dir,
                                 events_per_file=1000)
        dirs = PipelineDirs.under(root)
        q = start_table_pipeline(spark, log_dir, "employees", dirs,
                                 max_files_per_trigger=1)
        q.awaitTermination()
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
        phases: dict[str, list[float]] = {}
        for p in progress[1:]:  # drop warmup trigger
            for k, v in p["durationMs"].items():
                phases.setdefault(k, []).append(v / 1000.0)
        out = {"n_batches": len(progress) - 1}
        for k, vals in sorted(phases.items()):
            out[k] = {"p50": round(statistics.median(vals), 3),
                      "p95": round(pctl(vals, 0.95), 3)}
        print(json.dumps({"exp": "phase_breakdown", **out}), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def sink_breakdown(spark) -> None:
    """Time each sink's stage on an identical warm 1k-row batch."""
    from debezium_nats_cdc_spark.registry import default_registry
    from debezium_nats_cdc_spark.sources import fixtures
    from debezium_nats_cdc_spark.sources.cdc import read_change_log
    from debezium_nats_cdc_spark.streaming.bench import _synthetic_updates
    from debezium_nats_cdc_spark.operators.unwrap import unwrap
    from debezium_nats_cdc_spark.streaming.pipeline import (
        PipelineDirs, _sink_audit, _sink_events, _sink_state)

    root = tempfile.mkdtemp(prefix="cdc-sinks-")
    try:
        log_dir = os.path.join(root, "log")
        fixtures.write_event_log(_synthetic_updates(1000), log_dir,
                                 events_per_file=1000)
        batch = unwrap(read_change_log(spark, log_dir, "employees")) \
            .localCheckpoint(eager=True)
        registry = default_registry()
        dirs = PipelineDirs.under(root)
        sinks = {
            "events": lambda e: _sink_events(batch, "employees", dirs, e,
                                             registry),
            "audit": lambda e: _sink_audit(batch, "employees", dirs, e),
            "state": lambda e: _sink_state(spark, batch, "employees", dirs, e),
        }
        epoch = 0
        results: dict[str, list[float]] = {k: [] for k in sinks}
        for rep in range(6):  # rep 0 = warm, dropped below
            for name, fn in sinks.items():
                t0 = time.time()
                fn(epoch)
                results[name].append(time.time() - t0)
                epoch += 1
        out = {name: {"warm_ms": round(v[0] * 1000),
                      "median_ms": round(statistics.median(v[1:]) * 1000)}
               for name, v in results.items()}
        print(json.dumps({"exp": "sink_breakdown", **out}), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from debezium_nats_cdc_spark.session import get_session

    spark = get_session("latency-decompose")
    phase_breakdown(spark)
    sink_breakdown(spark)


if __name__ == "__main__":
    main()
