"""The ann_search_after_lifecycle catalog query (VERDICT r12 task 1):
the persisted IVF index's build -> stream-ingest -> compact sequence,
verified end-to-end against a brute-force scan that never sees the
index."""

from __future__ import annotations

import json
import os

from pyspark.sql import Window as W, functions as F

from debezium_nats_cdc_spark.operators.ann_lifecycle import (
    _K,
    _N_QUERIES,
    _clean_embeddings,
    ann_search_after_lifecycle,
    run_lifecycle,
)
from debezium_nats_cdc_spark.operators.similarity import _pair_cos, _with_norm

SF = "/root/testdata/sf0.001"


def _brute_topk(spark):
    """Independent exact top-k over the clean corpus (no index code)."""
    e = _with_norm(_clean_embeddings(spark, SF))
    q = _with_norm(
        _clean_embeddings(spark, SF).filter(F.col("vec_id") < _N_QUERIES)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
    )
    cos = F.round(
        _pair_cos(F.col("q_emb"), F.col("embedding"),
                  F.col("q_norm"), F.col("_norm")), 6
    ).cast("decimal(10,6)")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                          F.asc("neighbor_id"))
    return (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cos.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _K)
        .withColumn("rnk", F.col("rnk").cast("int"))
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
    )


def test_query_equals_brute_force(spark):
    got = ann_search_after_lifecycle(spark, SF)
    want = _brute_topk(spark)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_lifecycle_end_state(spark, tmp_path):
    """The mutations really ran: every clean row is in the BASE area
    (compaction folded the stream partitions), the stream area is gone,
    and the sidecar carries the compaction's generation bump with the
    last ingested epoch preserved (resume-redelivery no-ops)."""
    clean = _clean_embeddings(spark, SF)
    d = str(tmp_path / "index")
    run_lifecycle(spark, clean, d)

    base = spark.read.parquet(os.path.join(d, "vectors"))
    assert base.count() == clean.count()
    assert sorted(r[0] for r in base.select("vec_id").collect()) == \
        sorted(r[0] for r in clean.select("vec_id").collect())
    assert not os.path.isdir(os.path.join(d, "vectors_stream"))

    with open(os.path.join(d, "_stream_epoch.json")) as f:
        side = json.load(f)
    assert side == {"generation": 1, "last_epoch": 1}


def test_empty_corpus_returns_empty_with_schema(spark, tmp_path):
    """Fuzz empty-facts contract: no clean vectors -> 0 rows, stable
    schema, no index build attempted."""
    empty_sf = str(tmp_path / "sf")
    os.makedirs(empty_sf)
    (
        spark.createDataFrame(
            [], "vec_id bigint, embedding array<float>, label int")
        .write.parquet(os.path.join(empty_sf, "embeddings.parquet"))
    )
    out = ann_search_after_lifecycle(spark, empty_sf)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == \
        ["query_id", "neighbor_id", "cos_sim", "rnk"]
