#!/usr/bin/env python
"""Interleaved A/B of TopKMonitor's exact vs sketch-prefiltered batch
path (VERDICT r6 #6 follow-through: the recall statement is property-
tested; this measures what the filter BUYS).

Synthetic 64-dim corpus: |Q| standing queries, batches of |B| vectors
with a near-dup fraction planted on the queries (the regime the
prefilter targets).  A-B-B-A per rep; reports per-batch wall time and
the scored-pair reduction.

Usage: python tools/ab_topk_prefilter.py [n_queries] [batch] [reps]
"""

from __future__ import annotations

import math
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

DIM = 64


def _unit(rng):
    v = [rng.uniform(-1.0, 1.0) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def main() -> int:
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_b = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F  # noqa: F401

    from debezium_nats_cdc_spark.session import get_session
    from debezium_nats_cdc_spark.streaming.topk_monitor import TopKMonitor

    spark = get_session("ab-topk-prefilter")
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(7)
    queries = [(i, _unit(rng)) for i in range(n_q)]
    qdf = spark.createDataFrame(queries,
                                "vec_id long, embedding array<float>")
    # 3 batches: 10% near-clones of random queries, rest background
    batches = []
    nid = 10_000
    for _ in range(3):
        rows = []
        for _ in range(n_b):
            if rng.random() < 0.1:
                q = queries[rng.randrange(n_q)][1]
                rows.append((nid, [x + rng.gauss(0, 0.02) for x in q]))
            else:
                rows.append((nid, _unit(rng)))
            nid += 1
        batches.append(spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
            .localCheckpoint(eager=True))

    def run(prefilter: bool) -> float:
        root = tempfile.mkdtemp(prefix=f"ab-topk-{prefilter}-")
        try:
            mon = TopKMonitor(root, qdf, k=5, prefilter=prefilter)
            t0 = time.time()
            for i, b in enumerate(batches):
                mon.process_batch(spark, b, epoch_id=i)
            return time.time() - t0
        finally:
            shutil.rmtree(root, ignore_errors=True)

    results = {False: [], True: []}
    for rep in range(reps):
        for pf in (False, True, True, False):
            wall = run(pf)
            results[pf].append(wall)
            print(f"rep{rep} {'prefilter' if pf else 'exact    '}: "
                  f"{wall:6.2f}s", flush=True)
    for pf, walls in results.items():
        walls = sorted(walls)
        print(f"{'prefilter' if pf else 'exact'}: best {walls[0]:.2f}s "
              f"median {walls[len(walls) // 2]:.2f}s over {len(walls)} runs")
    print(f"scored-pair universe: exact = {n_q * n_b:,}/batch; "
          f"prefilter scores only sketch collisions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
