#!/usr/bin/env python
"""Streaming ANN ingest under load (VERDICT r11 stretch #8).

`IvfStreamIngest` has correctness pins (exactly-once-by-layout, replay,
rebalance interplay) but no throughput/state record.  This bench feeds
B micro-batches of V clustered 64-dim vectors through `process_batch`
against a pre-built index and records, per batch:

  * ingest wall clock -> vectors/s (the sink's sustained rate);
  * stream-area growth: bytes + files vs vectors ingested (the
    exactly-once layout writes one (cell, epoch) partition per touched
    cell per batch — file count grows ~cells/batch, a compaction input
    the OPERATIONS.md policy sizes);
  * search-latency-while-ingesting: a fixed 8-query probe (nprobe=4)
    timed after every batch — the read-side cost of an ever-growing
    epoch-partitioned area;
  * `ivf_cell_stats` max_share after the run — the auto-rebalance
    trigger input (OPERATIONS.md §11 policy).

Usage: python tools/ann_ingest_bench.py [batches] [vectors_per_batch]
Prints one JSON line per batch + a summary line; paste the summary
into BENCHLOG.md and the state row into STREAMSTATE.md's note.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 12
PER_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
DIM, N_CELLS, BASE = 64, 16, 20_000


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.operators.ann_index import (
        ivf_build, ivf_cell_stats, ivf_search)
    from debezium_nats_cdc_spark.session import get_session
    from debezium_nats_cdc_spark.streaming.ann_ingest import IvfStreamIngest

    spark = get_session("ann-ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.RandomState(42)
    centers = rng.randn(N_CELLS, DIM) * 5

    def make(ids):
        ids = np.asarray(list(ids))
        cs = centers[ids % N_CELLS] + rng.randn(len(ids), DIM) * 0.3
        return spark.createDataFrame(
            [(int(i), [float(x) for x in row]) for i, row in zip(ids, cs)],
            "vec_id long, embedding array<double>")

    import tempfile
    d = os.path.join(tempfile.mkdtemp(prefix="ann_ingest_bench_"), "ivf")
    ivf_build(spark, make(range(BASE)), d, n_cells=N_CELLS)
    ing = IvfStreamIngest(d)
    queries = make(range(8))

    def area_stats():
        total, files = 0, 0
        for root, _, fs in os.walk(os.path.join(d, "vectors_stream")):
            for f in fs:
                if f.endswith(".parquet"):
                    files += 1
                    total += os.path.getsize(os.path.join(root, f))
        return total, files

    # warm codegen
    ivf_search(spark, d, queries, k=5, nprobe=4).collect()

    rates, lat = [], []
    nxt = BASE
    for b in range(BATCHES):
        batch = make(range(nxt, nxt + PER_BATCH))
        nxt += PER_BATCH
        batch = batch.localCheckpoint(eager=True)  # time the SINK, not gen
        t0 = time.time()
        ing.process_batch(spark, batch, epoch_id=b)
        ingest_s = time.time() - t0
        t1 = time.time()
        ivf_search(spark, d, queries, k=5, nprobe=4).collect()
        search_s = time.time() - t1
        size, files = area_stats()
        rates.append(PER_BATCH / ingest_s)
        lat.append(search_s)
        print(json.dumps({
            "batch": b, "ingest_s": round(ingest_s, 3),
            "vectors_per_s": int(PER_BATCH / ingest_s),
            "search_s": round(search_s, 3),
            "stream_bytes": size, "stream_files": files,
            "loadavg": round(os.getloadavg()[0], 1)}), flush=True)
    post = ivf_cell_stats(spark, d).collect()
    size, files = area_stats()
    print(json.dumps({
        "summary": True, "batches": BATCHES, "per_batch": PER_BATCH,
        "ingested": BATCHES * PER_BATCH,
        "median_vectors_per_s": int(statistics.median(rates)),
        "search_s_first": round(lat[0], 3),
        "search_s_last": round(lat[-1], 3),
        "search_s_median": round(statistics.median(lat), 3),
        "bytes_per_vector": round(size / (BATCHES * PER_BATCH), 1),
        "files_per_batch": round(files / BATCHES, 1),
        "max_share_post": round(max(r["share"] for r in post), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
