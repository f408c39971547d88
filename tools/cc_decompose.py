#!/usr/bin/env python
"""Decompose dedup_cluster_assign's cost (VERDICT r10 task 3).

The query = Jaccard pair pipeline (shared with dedup_ngram_jaccard,
localCheckpoint-cached) + connected-components fixed point + sizes
join.  This tool times each part separately at sf0.1, then times the
r8 kernel (dedup.connected_components) against the delta kernel
(components.connected_components_delta) over the SAME materialized
edge set, interleaved A-B-B-A so ambient drift spreads across both
arms.  Also reports the round count each kernel needed.

Usage: python tools/cc_decompose.py [sf_dir] [reps]
Prints one JSON line per measurement; paste medians into BENCHLOG.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def loadavg() -> float:
    return round(os.getloadavg()[0], 1)


def main() -> None:
    from debezium_nats_cdc_spark.operators import components, dedup
    from debezium_nats_cdc_spark.session import get_session

    spark = get_session("cc-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"sf_dir": SF_DIR, "loadavg_at_start": loadavg()}),
          flush=True)

    # warm: codegen + scan cache
    dedup.clear_pair_cache()
    dedup._jaccard_edges(spark, SF_DIR).count()

    # part 1: pair pipeline materialization (cache cleared each time)
    pair_times = []
    for _ in range(REPS):
        dedup.clear_pair_cache()
        t0 = time.time()
        n_edges = dedup._jaccard_edges(spark, SF_DIR).count()
        pair_times.append(round(time.time() - t0, 3))
    print(json.dumps({"part": "pair_pipeline", "n_edges": n_edges,
                      "runs": pair_times,
                      "median": statistics.median(pair_times),
                      "loadavg": loadavg()}), flush=True)

    # part 2: CC kernels over the SAME cached edge set, interleaved
    edges = (dedup._jaccard_edges(spark, SF_DIR)
             .select("doc_a", "doc_b").localCheckpoint(eager=True))
    arms = {"v1_r8": dedup.connected_components,
            "delta_r11": components.connected_components_delta}
    order = (["v1_r8", "delta_r11", "delta_r11", "v1_r8"] * REPS)[:4 * REPS]
    times: dict[str, list[float]] = {a: [] for a in arms}
    n_nodes = {}
    for arm in order:
        t0 = time.time()
        n_nodes[arm] = arms[arm](edges).count()
        took = round(time.time() - t0, 3)
        times[arm].append(took)
        print(json.dumps({"part": "cc_loop", "arm": arm, "sec": took,
                          "loadavg": loadavg()}), flush=True)
    assert len(set(n_nodes.values())) == 1, n_nodes  # same labeled set
    for arm, runs in times.items():
        print(json.dumps({"part": "cc_loop", "arm": arm,
                          "median": statistics.median(runs),
                          "min": min(runs), "runs": runs,
                          "n_nodes": n_nodes[arm]}), flush=True)

    # part 3: the full registered queries, interleaved, cache cleared
    qarms = {"dedup_cluster_assign": dedup.dedup_cluster_assign,
             "dedup_cluster_assign_delta":
                 components.dedup_cluster_assign_delta}
    qorder = (list(qarms) + list(reversed(qarms))) * REPS
    qtimes: dict[str, list[float]] = {a: [] for a in qarms}
    for arm in qorder[:4 * REPS]:
        dedup.clear_pair_cache()
        t0 = time.time()
        qarms[arm](spark, SF_DIR).write.format("noop") \
            .mode("overwrite").save()
        took = round(time.time() - t0, 3)
        qtimes[arm].append(took)
        print(json.dumps({"part": "full_query", "arm": arm, "sec": took,
                          "loadavg": loadavg()}), flush=True)
    for arm, runs in qtimes.items():
        print(json.dumps({"part": "full_query", "arm": arm,
                          "median": statistics.median(runs),
                          "min": min(runs), "runs": runs}), flush=True)


if __name__ == "__main__":
    main()
