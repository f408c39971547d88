"""Same-session A/B harness for the streaming SLO knobs (VERDICT r5 #4/#5).

Two experiments, each interleaved A-B-B-A so ambient drift cancels
instead of biasing one arm:

  throughput  500k-event end-to-end runs, empty SchemaRegistry (no
              payload contracts — the r4-equivalent pipeline) vs
              default_registry() (full 14-subject validation).
              Isolates the registry's events/s cost that VERDICT r5 #5
              left unquantified (r5 only A/B'd the LATENCY shape).

  latency     40x 1k-event micro-batches, state-store partitions 8
              (shipped default) vs 4 — the per-partition commit tail is
              a fixed per-batch cost at single-node scale, so fewer
              partitions should shave P50/P95 (VERDICT r5 #4's concrete
              lead).  The conf is session-settable and each run uses a
              fresh checkpoint, so one process covers both arms.

Usage: python tools/ab_streaming.py [throughput|latency|all] [reps]
Prints one JSON line per run plus a per-arm summary; paste into
BENCHLOG.md.
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

STATE_PARTITIONS_CONF = "spark.sql.streaming.internal.stateStore.partitions"


def loadavg() -> float:
    return round(os.getloadavg()[0], 1)


def run_throughput(spark, registry, n_events: int = 500_000,
                   source: str = "json") -> dict:
    from debezium_nats_cdc_spark.sources import fixtures
    from debezium_nats_cdc_spark.streaming.bench import _synthetic_updates
    from debezium_nats_cdc_spark.streaming.pipeline import run_pipeline_until_done

    root = tempfile.mkdtemp(prefix="cdc-ab-")
    try:
        log_dir = os.path.join(root, "log")
        events = _synthetic_updates(n_events)
        if source == "broker":
            fixtures.write_broker_log(events, log_dir, events_per_file=2000)
        else:
            fixtures.write_event_log(events, log_dir, events_per_file=2000)
        t0 = time.time()
        run_pipeline_until_done(spark, log_dir, root, tables=["employees"],
                                registry=registry, source=source)
        wall = time.time() - t0
        return {"events_per_sec": round(n_events / wall, 1),
                "wall_sec": round(wall, 2), "loadavg": loadavg()}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_latency(spark, state_partitions: int) -> dict:
    from debezium_nats_cdc_spark.streaming.bench import microbatch_latency

    prev = spark.conf.get(STATE_PARTITIONS_CONF, None)
    spark.conf.set(STATE_PARTITIONS_CONF, str(state_partitions))
    try:
        out = microbatch_latency(spark)
    finally:
        if prev is not None:
            spark.conf.set(STATE_PARTITIONS_CONF, prev)
    out["state_partitions"] = state_partitions
    out["loadavg"] = loadavg()
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from debezium_nats_cdc_spark.session import get_session
    from debezium_nats_cdc_spark.registry import SchemaRegistry, default_registry

    spark = get_session("ab-streaming")

    if which in ("throughput", "all"):
        arms = {"empty_registry": SchemaRegistry(),
                "default_registry": default_registry()}
        # warm both arms' plans once so neither pays first-run codegen
        for name, reg in arms.items():
            run_throughput(spark, reg, n_events=2000)
        results: dict[str, list[float]] = {a: [] for a in arms}
        order = (["empty_registry", "default_registry",
                  "default_registry", "empty_registry"] * reps)[: 4 * reps]
        for arm in order:
            r = run_throughput(spark, arms[arm])
            r["arm"] = arm
            print(json.dumps({"exp": "throughput", **r}), flush=True)
            results[arm].append(r["events_per_sec"])
        for arm, vals in results.items():
            print(json.dumps({"exp": "throughput", "arm": arm,
                              "median_events_per_sec": statistics.median(vals),
                              "runs": vals}), flush=True)

    if which in ("source", "all"):
        # the two supported source formats at the same event volume:
        # JSON-lines schema-on-read vs Kafka-wire parquet records whose
        # value blob parses via ONE from_json (the shape a real broker
        # deployment reads)
        from debezium_nats_cdc_spark.registry import default_registry as _dr

        arms_src = ["json", "broker"]
        for s in arms_src:  # warm both plans
            run_throughput(spark, _dr(), n_events=2000, source=s)
        src_results: dict[str, list[float]] = {a: [] for a in arms_src}
        for s in (["json", "broker", "broker", "json"] * reps)[: 4 * reps]:
            r = run_throughput(spark, _dr(), source=s)
            r["arm"] = s
            print(json.dumps({"exp": "source", **r}), flush=True)
            src_results[s].append(r["events_per_sec"])
        for s, vals in src_results.items():
            print(json.dumps({"exp": "source", "arm": s,
                              "median_events_per_sec": statistics.median(vals),
                              "runs": vals}), flush=True)

    if which in ("latency", "all"):
        arms_lat = [8, 4]
        lat_results: dict[int, list[dict]] = {a: [] for a in arms_lat}
        order_lat = ([8, 4, 4, 8] * reps)[: 4 * reps]
        for arm in order_lat:
            r = run_latency(spark, arm)
            print(json.dumps({"exp": "latency", **r}), flush=True)
            lat_results[arm].append(r)
        for arm, runs in lat_results.items():
            p50 = statistics.median(r["stream_batch_p50_sec"] for r in runs)
            p95 = statistics.median(r["stream_batch_p95_sec"] for r in runs)
            print(json.dumps({"exp": "latency", "state_partitions": arm,
                              "median_p50": p50, "median_p95": p95}),
                  flush=True)


if __name__ == "__main__":
    main()
