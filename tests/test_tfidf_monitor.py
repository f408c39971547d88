"""TfidfMonitor: incremental df/tf state == batch recompute over
everything ingested; replay idempotence; drift alarm on a term flood.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.streaming.tfidf_monitor import TfidfMonitor

B1 = [(1, "apple banana apple"), (2, "apple cherry")]
B2 = [(3, "banana banana date"), (4, None), (5, "")]
B3 = [(6, "cherry apple"), (7, "egg egg egg")]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _recompute(spark, all_rows):
    """Ground truth: the batch TF/DF over the union of every ingested
    doc, with the same tokenizer."""
    from debezium_nats_cdc_spark.operators.text import _tokens

    d = _docs(spark, all_rows)
    tok = d.select(
        "doc_id",
        F.explode(_tokens(F.coalesce("text", F.lit("")))).alias("term"),
    ).filter(F.col("term") != "")
    per_doc = tok.groupBy("doc_id", "term").count()
    return {
        r.term: (r.tf, r.df)
        for r in per_doc.groupBy("term").agg(
            F.sum("count").alias("tf"), F.count("*").alias("df")).collect()
    }


def test_state_equals_batch_recompute_over_all_ingested(spark, tmp_path):
    mon = TfidfMonitor(str(tmp_path / "mon"))
    for i, b in enumerate([B1, B2, B3]):
        mon.process_batch(spark, _docs(spark, b), epoch_id=i)

    expect = _recompute(spark, B1 + B2 + B3)
    got = {r.term: (r.tf, r.df) for r in mon.terms(spark).collect()}
    assert got == expect

    n_docs, last_epoch = mon.meta(spark)
    assert n_docs == len(B1 + B2 + B3)  # NULL/empty docs count in N
    assert last_epoch == 2

    # top-k salience agrees with a hand recompute of tf*(ln((N+1)/(df+1))+1)
    import math
    top = mon.topk_salient(spark, k=2).collect()
    scores = {t: round(tf * (math.log((n_docs + 1) / (df + 1)) + 1), 6)
              for t, (tf, df) in expect.items()}
    best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r.term, r.weight) for r in top] == best


def test_replayed_epoch_is_noop(spark, tmp_path):
    mon = TfidfMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _docs(spark, B1), epoch_id=0)
    mon.process_batch(spark, _docs(spark, B2), epoch_id=1)
    snap = sorted(map(tuple, mon.terms(spark).collect()))
    n1, _ = mon.meta(spark)

    mon.process_batch(spark, _docs(spark, B2), epoch_id=1)  # replay
    mon.process_batch(spark, _docs(spark, B1), epoch_id=0)  # older replay
    assert sorted(map(tuple, mon.terms(spark).collect())) == snap
    assert mon.meta(spark) == (n1, 1)


def test_drift_alarm_on_term_flood(spark, tmp_path):
    mon = TfidfMonitor(str(tmp_path / "mon"), drift_top_n=5)
    # seed a normal corpus
    base = [(i, "the quick brown fox jumps over the lazy dog")
            for i in range(20)]
    mon.process_batch(spark, _docs(spark, base), epoch_id=0)
    # flood batch: a never-seen spam term dominates
    flood = [(100 + i, "viagra viagra viagra the") for i in range(10)]
    mon.process_batch(spark, _docs(spark, flood), epoch_id=1)

    drift = mon.latest_drift(spark).collect()
    assert drift, "drift report must exist after the flood batch"
    top = drift[0]
    assert top.term == "viagra" and top.is_new
    assert top.corpus_share == 0.0
    # a corpus term that appears in the flood has modest lift
    the = next(r for r in drift if r.term == "the")
    assert not the.is_new and the.lift < top.lift

    # state still correct after the drift write
    got = {r.term: (r.tf, r.df) for r in mon.terms(spark).collect()}
    expect = _recompute(spark, base + flood)
    assert got == expect


def test_streaming_entrypoint(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _docs(spark, B1).coalesce(1).write.parquet(os.path.join(in_dir, "b1"))
    _docs(spark, B3).coalesce(1).write.parquet(os.path.join(in_dir, "b2"))
    mon = TfidfMonitor(str(tmp_path / "mon"))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(in_dir, "*"))
    )
    mon.start(spark, stream).awaitTermination()
    got = {r.term: (r.tf, r.df) for r in mon.terms(spark).collect()}
    assert got == _recompute(spark, B1 + B3)


def test_fresh_checkpoint_restart_keeps_folding(spark, tmp_path):
    """A checkpoint reset restarts epoch ids at 0; the replay guard must
    not silently drop the new data (VERDICT-r9 review finding)."""
    root = str(tmp_path / "mon")
    mon = TfidfMonitor(root)
    mon.process_batch(spark, _docs(spark, B1), epoch_id=40)
    mon.process_batch(spark, _docs(spark, B2), epoch_id=41)
    assert mon.meta(spark)[1] == 41

    # restart with a FRESH checkpoint: stream re-delivers from epoch 0
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _docs(spark, B3).coalesce(1).write.parquet(os.path.join(in_dir, "b1"))
    mon2 = TfidfMonitor(root)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(os.path.join(in_dir, "*"))
    )
    mon2.start(spark, stream).awaitTermination()

    got = {r.term: (r.tf, r.df) for r in mon2.terms(spark).collect()}
    assert got == _recompute(spark, B1 + B2 + B3)
    n_docs, last_epoch = mon2.meta(spark)
    assert n_docs == len(B1 + B2 + B3)
    assert last_epoch == 0  # the new checkpoint's epoch sequence
