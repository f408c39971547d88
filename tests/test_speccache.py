"""speccache: build-once semantics and registry invalidation hooks."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_nats_cdc_spark import speccache
from debezium_nats_cdc_spark.registry import FieldSpec, SchemaRegistry


def test_per_context_builds_once_per_key(spark):
    calls = []

    def build():
        calls.append(1)
        return [F.lit(1).alias("one")]

    a = speccache.per_context(("t", "k1"), build)
    b = speccache.per_context(("t", "k1"), build)
    assert a is b and len(calls) == 1
    speccache.per_context(("t", "k2"), build)
    assert len(calls) == 2


def test_cached_spec_replays_against_different_dataframes(spark):
    cols = speccache.per_context(
        ("test", "double_id"), lambda: [(F.col("id") * 2).alias("twice")])
    r1 = spark.range(3).select(*cols).agg(F.sum("twice")).first()[0]
    r2 = spark.range(5).select(*cols).agg(F.sum("twice")).first()[0]
    assert (r1, r2) == (6, 20)


def test_registry_cache_invalidates_on_register(spark):
    reg = SchemaRegistry()
    reg.register("E", [FieldSpec("a", "string", True)])
    df = spark.createDataFrame(
        [("E", '{"a":"x"}'), ("E", '{"b":"y"}')], "eventType string, payload string")
    ev1, r1, h1 = reg.contract_check(df)
    bad1 = ev1.withColumn("r", r1).filter(F.col("r").isNotNull()).select("r").collect()
    assert bad1 and bad1[0].r == "schema:E:v1:a"
    # register v2 adding an optional field: cache must rebuild so the
    # version tag in the reason string moves to v2
    reg.register("E", [FieldSpec("a", "string", True), FieldSpec("c", "string")])
    ev2, r2, h2 = reg.contract_check(df)
    bad2 = ev2.withColumn("r", r2).filter(F.col("r").isNotNull()).select("r").collect()
    assert bad2 and bad2[0].r == "schema:E:v2:a"
