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


def test_null_lang_docs_form_und_stratum(spark, dirty_dir):
    """Docs whose lang-ID failed (NULL lang) must be their own 'und'
    stratum in the mixture ops — sampled at the 'und' weight, never
    silently dropped by the weight join (VERDICT r4 task #4)."""
    import hashlib

    from debezium_nats_cdc_spark import catalog

    qs = catalog.queries()
    mix = {r["lang"]: r["n_docs"]
           for r in qs["corpus_lang_mix"](spark, dirty_dir).collect()}
    assert None not in mix
    assert mix["und"] == 2  # docs 9001 and 9004 carry NULL lang

    sample = qs["corpus_quality_weighted_sample"](spark, dirty_dir)
    rows = {r["doc_id"]: r["lang"] for r in sample.collect()}
    assert None not in rows.values()
    # replicate the deterministic coin for the two NULL-lang docs: both
    # fail the quality gate (NULL n_chars), so w = und_lang_weight * 0.25
    total, n_langs = sum(mix.values()), len(mix)
    w = min(1.0, (total / n_langs) / mix["und"]) * 0.25
    expected = {
        doc for doc in (9001, 9004)
        if int(hashlib.md5(str(doc).encode()).hexdigest()[:15], 16)
        / float(1 << 60) < w
    }
    assert {d for d in rows if d in (9001, 9004)} == expected
    assert all(rows[d] == "und" for d in expected)


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


def test_asof_join_drops_null_user_attribution(spark, tmp_path):
    """Regression pin for the round-10 fuzz find (BENCHLOG): a NULL-user
    purchase must never be attributed to a NULL-user click.  Spark's
    window partitionBy groups NULLs into one partition; equi-join
    semantics (the oracle) match NULL to nothing."""
    from datetime import datetime

    from debezium_nats_cdc_spark.operators.advanced import (
        join_asof_last_click,
    )

    t0 = datetime(2024, 1, 1, 12, 0)
    t1 = datetime(2024, 1, 1, 13, 0)
    rows = [
        (1, t0, None, "click", None, None),     # NULL-user click
        (2, t1, None, "purchase", None, None),  # NULL-user purchase
        (3, t0, 7, "click", None, None),        # real attribution pair
        (4, t1, 7, "purchase", None, None),
    ]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = join_asof_last_click(spark, str(tmp_path)).collect()
    assert [(r.p_event_id, r.user_id, r.last_click_id) for r in out] == \
        [(4, 7, 3)]
