"""Streaming micro-bench (BASELINE.md engine-side plan).

Measures events/sec through the full unwrap -> dedup -> rules -> validate
-> store pipeline, matched to the reference SLOs: >= 10,000 events/s
sustained and < 2 s micro-batch latency (docs/system-design.md:326-329).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession

from ..sources import fixtures


def _synthetic_updates(n: int) -> list[dict]:
    """n deterministic employee salary-update envelopes (the reference's
    1,000-updates exactness scenario, docs/system-design.md:548-552,
    scaled up)."""
    base = fixtures.SEED_EMPLOYEES[0]
    out = []
    for i in range(n):
        before = {**base, "salary": 90000.0 + i}
        after = {**base, "salary": 90001.0 + i}
        out.append(
            fixtures.envelope("employees", "u", before, after,
                              fixtures.BASE_TS_MS + i)
        )
    return out


def streaming_events_per_sec(spark: SparkSession, n_events: int = 500_000) -> dict:
    from .pipeline import run_pipeline_until_done

    root = tempfile.mkdtemp(prefix="cdc-bench-")
    try:
        log_dir = os.path.join(root, "log")
        # ~2k events/file: JSON-lines files are the parallelism unit for
        # the file source (one 12 MB file = one single-threaded parse task)
        fixtures.write_event_log(
            _synthetic_updates(n_events), log_dir, events_per_file=2000
        )
        t0 = time.time()
        run_pipeline_until_done(spark, log_dir, root, tables=["employees"])
        wall = time.time() - t0
        return {
            "stream_events": n_events,
            "stream_wall_sec": round(wall, 3),
            "stream_events_per_sec": round(n_events / wall, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
