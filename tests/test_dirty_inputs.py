"""Corrupt-input robustness: every catalog query must EXECUTE over
tables carrying NULL/empty/degenerate rows (the r4 sweep that found the
mm_feature_extract NULL-payload crash; the vectors.py crash was the same
class).  At 100 TB one corrupt row must never fail a stage — queries
either absorb the row (NULL semantics) or filter it, but never raise.

Runs the whole catalog at sf0.001 + injected dirt; correctness of the
clean-path VALUES is the strict oracle gate's job, this gate is purely
"no stage-killing exceptions".
"""

from __future__ import annotations

import os
import shutil

import pytest


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("dirty"))
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    d = spark.read.parquet(f"{src}/documents.parquet")
    bad_docs = spark.createDataFrame(
        [(9001, None, "s", 0, None),          # NULL text, NULL lang
         (9002, "en", "s", 0, ""),            # empty text
         (9003, "en", None, 3, "a b"),        # NULL source, short text
         (9004, None, None, None, "   ")],    # whitespace-only, NULL n_chars
        "doc_id long, lang string, source string, n_chars int, text string")
    d.unionByName(bad_docs).coalesce(1).write.parquet(
        f"{dst}/documents.parquet")

    e = spark.read.parquet(f"{src}/embeddings.parquet")
    bad_emb = spark.createDataFrame(
        [(9001, None, 0), (9002, [1.0, 2.0], 0), (9003, [], None)],
        e.schema)
    e.unionByName(bad_emb).coalesce(1).write.parquet(
        f"{dst}/embeddings.parquet")
    return dst


def test_all_catalog_queries_survive_dirty_tables(spark, dirty_dir):
    from debezium_nats_cdc_spark import catalog

    failures = {}
    for name, fn in catalog.queries().items():
        try:
            fn(spark, dirty_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures[name] = str(ex).split("\n")[0][:200]
    assert not failures, f"queries crashed on dirty inputs: {failures}"


def test_mm_feature_extract_null_payload_yields_null_features(spark,
                                                              dirty_dir):
    from debezium_nats_cdc_spark import catalog

    out = {r["doc_id"]: r for r in
           catalog.queries()["mm_feature_extract"](spark, dirty_dir)
           .filter("doc_id >= 9001").collect()}
    r = out[9001]  # NULL text -> NULL features, row retained
    assert (r["n_bytes"] is None and r["frames"] is None
            and r["mean_intensity"] is None)
    r = out[9002]  # empty text -> 0 bytes, 1 frame, checksum 0
    assert r["n_bytes"] == 0 and r["frames"] == 1 and r["mean_intensity"] == 0.0
