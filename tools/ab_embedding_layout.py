#!/usr/bin/env python
"""Interleaved A/B of the streaming embedding-dedup index layouts
(denorm: vector in every bucket row x N_TABLES, vs norm: ids-only
buckets + vectors-once store) — VERDICT r6 #5.

sf0.1 ships 2,000 embeddings; an ingest A/B needs enough batches for
the probe join against a GROWN index to dominate, so the corpus is
replicated with id offsets (+ small deterministic jitter so replicas
are near-dups, exercising the quarantine path) into N_BATCHES batches
of |corpus| vectors each.  Runs A-B-B-A per rep (ambient-load
discipline from tools/ab_streaming.py); reports per-layout ingest wall
time and final index bytes.

Usage: python tools/ab_embedding_layout.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_BATCHES = 6
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _, files in os.walk(d):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def run_once(spark, batches, layout: str) -> tuple[float, int, dict]:
    from debezium_nats_cdc_spark.streaming.embedding_dedup import (
        EmbeddingDedupPipeline,
    )

    root = tempfile.mkdtemp(prefix=f"ab-{layout}-")
    try:
        pipe = EmbeddingDedupPipeline(root, layout=layout)
        t0 = time.time()
        for i, b in enumerate(batches):
            pipe.process_batch(spark, b, epoch_id=i)
        wall = time.time() - t0
        idx_bytes = _dir_bytes(pipe.index_dir)
        if layout == "norm":
            idx_bytes += _dir_bytes(pipe.vectors_dir)
        counts = {
            "accepted": spark.read.parquet(pipe.accepted_dir).count(),
            "quarantined": spark.read.parquet(pipe.quarantine_dir).count(),
        }
        return wall, idx_bytes, counts
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.io import load_table
    from debezium_nats_cdc_spark.session import get_session

    spark = get_session("ab-embedding-layout")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding")
    n = base.count()
    batches = []
    for i in range(N_BATCHES):
        # deterministic jitter keyed on (replica, position): replicas of
        # the same vector stay near-identical (cos ~ 1) so later batches
        # quarantine against the grown index — the production mix
        jit = F.transform(
            "embedding",
            lambda x, j: x + (F.hash(F.col("vec_id"), j, F.lit(i))
                              % 1000).cast("float") / 5.0e5,
        )
        b = base.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            jit.cast("array<float>").alias("embedding"),
        ).localCheckpoint(eager=True)
        batches.append(b)

    results: dict[str, list] = {"denorm": [], "norm": []}
    for rep in range(reps):
        order = ["denorm", "norm", "norm", "denorm"]
        for layout in order:
            wall, idx_bytes, counts = run_once(spark, batches, layout)
            results[layout].append((wall, idx_bytes, counts))
            print(f"rep{rep} {layout:6s}: {wall:6.2f}s  index "
                  f"{idx_bytes/1e6:7.2f} MB  {counts}", flush=True)

    for layout, rs in results.items():
        walls = sorted(w for w, _, _ in rs)
        print(f"{layout:6s}: best {walls[0]:.2f}s  median "
              f"{walls[len(walls)//2]:.2f}s  index "
              f"{rs[0][1]/1e6:.2f} MB over {len(rs)} runs")
    c0 = results["denorm"][0][2]
    assert all(r[2] == c0 for rs in results.values() for r in rs), \
        "layouts disagreed on accepted/quarantined counts"
    print("layout parity on sink counts: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
