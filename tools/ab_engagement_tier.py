#!/usr/bin/env python
"""Exact vs sketch engagement tier at the 100x regime-change point
(r14).

SCALING.md's 100x probe measured `monitor_engagement_publish` at
11.1x — the predicted state-shuffle regime change (state = distinct
(user, day) rows; the replica construction grows the user universe
100x, so every fold's state-keyed shuffle carries 100x rows).
OPERATIONS.md §9/§12's documented remediation is the HLL sketch tier
(`streaming/approx_engagement_monitor.py`, ONE sketch row per day at
any user volume).  This probe measures the remediation AT THAT POINT:
both tiers fold the same events in 3 pmod micro-batches (the
monitor_*_publish construction) at sf0.1 and at the replicated 100x
volume — same shifted-key replica construction as
`tools/scale_heavy_probe.py`, events only.

Usage: python tools/ab_engagement_tier.py [reps]
Prints one JSON line per tier with (sf0.1 s, 100x s, ratio).
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

SF_DIR = "/root/testdata/sf0.1"
BIG_DIR = "/tmp/sparkgraft_eng100x"
REPLICAS = 100
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def build_events(spark) -> None:
    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.io import load_table

    if os.path.isdir(BIG_DIR):
        shutil.rmtree(BIG_DIR)
    os.makedirs(BIG_DIR)
    ev = load_table(spark, SF_DIR, "events")
    parts = [
        ev.select(
            (F.col("event_id") + i * 10**12).alias("event_id"), "ts",
            (F.col("user_id") + i * 10**9).alias("user_id"),
            "event_type", "value", "props")
        for i in range(REPLICAS)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{BIG_DIR}/events.parquet")


def fold(spark, mon_cls, sf_dir: str) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.io import load_table

    events = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="ab_eng_")
    try:
        t0 = time.time()
        mon = mon_cls(root)
        for b in range(3):
            mon.process_batch(
                spark,
                events.filter(F.pmod(F.col("event_id"), 3) == b),
                epoch_id=b)
        n = mon.scored(spark).count()
        return round(time.time() - t0, 3), n
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from debezium_nats_cdc_spark.session import get_session
    from debezium_nats_cdc_spark.streaming.approx_engagement_monitor import \
        ApproxEngagementMonitor
    from debezium_nats_cdc_spark.streaming.engagement_monitor import \
        EngagementMonitor

    spark = get_session("ab-engagement-tier")
    spark.sparkContext.setLogLevel("ERROR")
    build_events(spark)
    tiers = {"exact": EngagementMonitor, "sketch": ApproxEngagementMonitor}
    for cls in tiers.values():  # warm codegen both scales
        for d in (SF_DIR, BIG_DIR):
            fold(spark, cls, d)
    times: dict[tuple[str, str], list[float]] = {}
    for _r in range(REPS):
        for name, cls in tiers.items():
            for d in (SF_DIR, BIG_DIR):
                dt, _n = fold(spark, cls, d)
                times.setdefault((name, d), []).append(dt)
    for name in tiers:
        s = statistics.median(times[(name, SF_DIR)])
        b = statistics.median(times[(name, BIG_DIR)])
        print(json.dumps({
            "tier": name, "sf0.1_s": s, "x100_s": b,
            "ratio_100x": round(b / s, 2),
            "runs_sf01": times[(name, SF_DIR)],
            "runs_x100": times[(name, BIG_DIR)],
            "loadavg": round(os.getloadavg()[0], 1),
        }), flush=True)


if __name__ == "__main__":
    main()
