#!/usr/bin/env python
"""Settle the SCALING.md adjusted-ratio tail (VERDICT r11 task 6).

Three sub-second queries sit over the adjusted-linear line across the
sf0.01->sf0.1 decade (window_field_diff_audit adj 13.5,
scalar_functions_showcase 11.2, agg_cube_orders 10.3) with raw ratios
of only 4.1/4.9/2.7.  The adjusted metric subtracts a GLOBAL per-SF p5
floor; for a 0.2 s query whose own fixed overhead (plan, codegen,
stage scheduling) is near its whole runtime, the denominator is noise
and the ratio is an artifact.  The honest settle is a LARGER scale
point, which the driver testdata does not provide — so this probe
manufactures one: each input table is replicated 10x with SHIFTED
entity keys (new event/user/order ids per replica, everything else
verbatim), preserving per-key row counts and group cardinalities per
replica, i.e. the same data shape at 10x volume.  A query that is
genuinely super-linear in the decade would show ratio >> 10 here,
where the floor is amortized to irrelevance (multi-second runtimes).

Usage: python tools/scale_tail_probe.py [reps]
Writes the replicated tables under /tmp/sparkgraft_sf1/ and prints one
JSON line per query with (sf0.1 s, 10x s, ratio).  Paste the medians
into SCALING.md's tail note.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
BIG_DIR = "/tmp/sparkgraft_sf1"
REPLICAS = 10
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

QUERIES = ["window_lag_timeline", "scalar_functions_showcase",
           "agg_cube_orders"]


def build_big(spark) -> None:
    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.io import load_table

    os.makedirs(BIG_DIR, exist_ok=True)
    ev = load_table(spark, SF_DIR, "events")
    parts = [
        ev.select(
            (F.col("event_id") + i * 10**12).alias("event_id"), "ts",
            (F.col("user_id") + i * 10**9).alias("user_id"),
            "event_type", "value", "props")
        for i in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{BIG_DIR}/events.parquet")

    od = load_table(spark, SF_DIR, "orders")
    keyed = [
        od.withColumn("o_orderkey", F.col("o_orderkey") + i * 10**9)
        for i in range(REPLICAS)
    ]
    out = keyed[0]
    for p in keyed[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{BIG_DIR}/orders.parquet")


def main() -> None:
    from debezium_nats_cdc_spark import catalog
    from debezium_nats_cdc_spark.session import get_session

    spark = get_session("scale-tail-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_big(spark)
    ents = catalog.entries()
    # warm codegen both scales
    for q in QUERIES:
        for d in (SF_DIR, BIG_DIR):
            ents[q].fn(spark, d).write.format("noop").mode("overwrite").save()
    times: dict[tuple[str, str], list[float]] = {}
    for r in range(REPS):
        order = QUERIES if r % 2 == 0 else list(reversed(QUERIES))
        for q in order:
            for d in (SF_DIR, BIG_DIR):
                t0 = time.time()
                ents[q].fn(spark, d).write.format("noop") \
                    .mode("overwrite").save()
                times.setdefault((q, d), []).append(
                    round(time.time() - t0, 3))
    for q in QUERIES:
        s = statistics.median(times[(q, SF_DIR)])
        b = statistics.median(times[(q, BIG_DIR)])
        print(json.dumps({
            "query": q, "sf0.1_s": s, "x10_s": b,
            "raw_ratio_10x": round(b / s, 2),
            "runs_sf01": times[(q, SF_DIR)],
            "runs_x10": times[(q, BIG_DIR)],
            "loadavg": round(os.getloadavg()[0], 1),
        }), flush=True)


if __name__ == "__main__":
    main()
