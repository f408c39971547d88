"""Bucketed co-located joins (SURVEY §4 physical-layout choices).

At 100 TB, fact-to-fact joins (events ⋈ events-derived aggregates,
lineitem ⋈ orders) dominate shuffle volume.  Bucketing both sides on the
join key at write time makes every later join exchange-free; these tests
pin that contract at plan level.
"""

from __future__ import annotations


import pytest

from debezium_nats_cdc_spark.plans.explain import (
    count_exchanges as _n_exchanges,
)
from debezium_nats_cdc_spark.io import load_table
from debezium_nats_cdc_spark.plans.explain import formatted_plan
from debezium_nats_cdc_spark.store import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{root}'")
    events = load_table(spark, SF, "events")
    per_event = events.select("event_id", "user_id", "ts", "event_type")
    per_user = events.groupBy("user_id").count()
    write_bucketed(per_event, "bktdb.events_b", ["user_id"], n_buckets=8)
    write_bucketed(per_user, "bktdb.user_stats_b", ["user_id"], n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS bktdb.events_b")
    spark.sql("DROP TABLE IF EXISTS bktdb.user_stats_b")
    spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    """Same key, same bucket count => join with ZERO exchanges."""
    a = spark.table("bktdb.events_b")
    b = spark.table("bktdb.user_stats_b")
    # disable broadcast so the join strategy is the bucketed SMJ the
    # 100 TB (both-sides-huge) case would use
    with_conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "user_id")
        plan = formatted_plan(joined)
        assert _n_exchanges(plan) == 0, plan
        assert joined.count() == a.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_conf)


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    """Aggregation on the bucket key also needs no exchange."""
    a = spark.table("bktdb.events_b")
    plan = formatted_plan(a.groupBy("user_id").count())
    assert _n_exchanges(plan) == 0, plan
