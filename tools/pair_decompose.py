#!/usr/bin/env python
"""Decompose the shared Jaccard pair pipeline's end-to-end floor
(VERDICT r11 task 1: the 2.2-2.7 s BENCHLOG round-11 measurement paid
by dedup_ngram_jaccard / dedup_cluster_assign_delta / corpus_curation).

Times successive PREFIXES of the pipeline with noop writes (count()
would let column pruning delete the very expressions being measured),
cache cleared per run, interleaved so ambient drift spreads evenly:

  p1  scan -> tokenize -> shingle arrays          (doc_shingles)
  p2  p1 -> explode -> xxhash64 postings
  p3  p2 -> window bucket stats -> candidate pairs (_candidate_pairs)
  p4  p3 -> groupBy(doc_a, doc_b) agg -> threshold (= _jaccard_edges)

Stage cost ~= adjacent-prefix delta.  Optionally A/Bs an alternative
pipeline arm passed by name.  Usage:
  python tools/pair_decompose.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.io import load_table
    from debezium_nats_cdc_spark.operators import dedup
    from debezium_nats_cdc_spark.session import get_session

    spark = get_session("pair-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    def p1():
        d = load_table(spark, SF_DIR, "documents")
        return dedup.doc_shingles(d).filter(F.col("n_toks") >= 3)

    def p2():
        return p1().select(
            "doc_id", F.explode_outer("gs").alias("g"),
            F.size("gs").alias("sz")
        ).select("doc_id", F.xxhash64("g").alias("g"), "sz")

    def p3():
        return dedup._candidate_pairs(p2(), ["g"], ["sz"], "decompose")

    def p4():
        dedup.clear_pair_cache()
        return dedup._jaccard_edges(spark, SF_DIR)

    arms = {"p1_shingles": p1, "p2_postings": p2,
            "p3_pairs": p3, "p4_edges": p4}
    # warm codegen once per arm
    for fn in arms.values():
        fn().write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {a: [] for a in arms}
    for r in range(REPS):
        order = list(arms) if r % 2 == 0 else list(reversed(arms))
        for a in order:
            dedup.clear_pair_cache()
            t0 = time.time()
            arms[a]().write.format("noop").mode("overwrite").save()
            took = round(time.time() - t0, 3)
            times[a].append(took)
            print(json.dumps({"arm": a, "sec": took,
                              "loadavg": round(os.getloadavg()[0], 1)}),
                  flush=True)
    meds = {a: statistics.median(v) for a, v in times.items()}
    print(json.dumps({"medians": meds, "deltas": {
        "shingle_gen": meds["p1_shingles"],
        "explode_hash": round(meds["p2_postings"] - meds["p1_shingles"], 3),
        "window_expand": round(meds["p3_pairs"] - meds["p2_postings"], 3),
        "final_agg": round(meds["p4_edges"] - meds["p3_pairs"], 3),
    }}), flush=True)


if __name__ == "__main__":
    main()
