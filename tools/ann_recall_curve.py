#!/usr/bin/env python
"""Measured IVF recall@k vs nprobe — the operating-point table a real
deployment tunes with (VERDICT r9 #8).

Builds the persisted IVF index over the sf embeddings, takes a
deterministic query sample (every STRIDE-th vec_id), and for each
nprobe compares ivf_search's top-k neighbor sets against exact
brute-force ground truth (ivf_search at nprobe = n_cells, which scans
every cell — tests/test_ann_index.py pins that equals brute force).

recall@k per query = |approx top-k ∩ exact top-k| / k, averaged.
Ties at the k-th cosine are broken identically in both runs
(desc cos, asc neighbor_id), so recall 1.0 is achievable exactly.

Usage: python tools/ann_recall_curve.py [sf_dir] [k]
Prints one JSON line per nprobe; paste the table into OPERATIONS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
N_CELLS = 16
STRIDE = 17  # every 17th vector is a query — deterministic, spread out


def topk_sets(df) -> dict:
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main() -> int:
    from debezium_nats_cdc_spark.io import load_table
    from debezium_nats_cdc_spark.operators import ann_index
    from debezium_nats_cdc_spark.session import get_session
    from pyspark.sql import functions as F

    spark = get_session("ann-recall-curve")
    spark.sparkContext.setLogLevel("ERROR")

    vectors = load_table(spark, SF_DIR, "embeddings")
    queries = vectors.filter(F.col("vec_id") % STRIDE == 0)
    n_vec = vectors.count()
    n_q = queries.count()

    root = tempfile.mkdtemp(prefix="ann-recall-")
    try:
        idx = os.path.join(root, "ivf")
        ann_index.ivf_build(spark, vectors, idx, n_cells=N_CELLS)
        exact = topk_sets(
            ann_index.ivf_search(spark, idx, queries, k=K, nprobe=N_CELLS))
        print(json.dumps({"sf_dir": SF_DIR, "n_vectors": n_vec,
                          "n_queries": n_q, "k": K, "n_cells": N_CELLS}),
              flush=True)
        for nprobe in (1, 2, 3, 4, 6, 8, 12, 16):
            approx = topk_sets(
                ann_index.ivf_search(spark, idx, queries, k=K, nprobe=nprobe))
            recalls = [len(approx.get(q, set()) & hits) / len(hits)
                       for q, hits in exact.items() if hits]
            recall = sum(recalls) / len(recalls) if recalls else float("nan")
            frac = nprobe / N_CELLS
            print(json.dumps({"nprobe": nprobe,
                              "scan_fraction": round(frac, 3),
                              f"recall_at_{K}": round(recall, 4)}),
                  flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
