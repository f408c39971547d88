"""Hand-computed fixtures for the r9 star-schema analytics operators
(operators/analytics.py) and the erasure cascade (operators/curation.py):
TPC-H-Q5-shaped regional revenue, rolling z-score anomaly monitor, and
the right-to-erasure cascade audit.

Value parity vs DuckDB is covered by the driver oracle + strict sweep;
these pin the SEMANTICS to numbers computed by hand — the local-supplier
cross-constraint and date-range fencing (revenue), the trailing-window
mean/variance arithmetic incl. the constant-history std=0 edge (zscore),
and the FK hop-by-hop blast radius incl. NULL-key drop-out (erasure).
"""

from __future__ import annotations

from datetime import datetime

from debezium_nats_cdc_spark.operators.analytics import (
    agg_regional_revenue,
    events_anomaly_zscore,
)
from debezium_nats_cdc_spark.operators.curation import pii_erasure_cascade

_EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                  "event_type string, value double, props string")


def _write(spark, tmp_path, name, rows, schema):
    (spark.createDataFrame(rows, schema)
          .write.mode("overwrite")
          .parquet(f"{tmp_path}/{name}.parquet"))


def _day_counts(spark, tmp_path, type_day_counts):
    """events.parquet with exactly `count` rows per (event_type, day)."""
    rows, eid = [], 0
    for et, day, count in type_day_counts:
        for _ in range(count):
            rows.append((eid, datetime(2024, 1, day, 12, 0), 1, et,
                         None, None))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
    return str(tmp_path)


def test_zscore_hand_computed_spike(spark, tmp_path):
    # type "a": counts 1,2,3 then a day-4 spike of 9.
    #   day4: k=3, s1=6, s2=1+4+9=14, mean=2,
    #   var=(14-36/3)/2=1, std=1 -> z=(9-2)/1=7.0, anomaly
    sf = _day_counts(spark, tmp_path, [
        ("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("a", 4, 9),
    ])
    rows = {r.event_day: r for r in events_anomaly_zscore(spark, sf).collect()}
    assert rows["2024-01-01"].n_prev_days == 0
    assert rows["2024-01-01"].z_score is None
    assert rows["2024-01-01"].is_anomaly is None
    assert rows["2024-01-02"].z_score is None       # k=1 < MIN_HISTORY
    assert rows["2024-01-03"].z_score is None       # k=2 < MIN_HISTORY
    r4 = rows["2024-01-04"]
    assert r4.n_events == 9 and r4.n_prev_days == 3
    assert r4.z_score == 7.0
    assert r4.is_anomaly is True


def test_zscore_constant_history_yields_null_not_inf(spark, tmp_path):
    # 2,2,2 then 8: var=0 -> std=0 -> z NULL (not +inf), flag NULL
    sf = _day_counts(spark, tmp_path, [
        ("a", 1, 2), ("a", 2, 2), ("a", 3, 2), ("a", 4, 8),
    ])
    r4 = {r.event_day: r
          for r in events_anomaly_zscore(spark, sf).collect()}["2024-01-04"]
    assert r4.z_score is None and r4.is_anomaly is None


def test_zscore_within_band_not_anomalous(spark, tmp_path):
    # 1,2,3 then 3: mean=2, std=1 -> z=1.0 < 2.5 -> not an anomaly
    sf = _day_counts(spark, tmp_path, [
        ("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("a", 4, 3),
    ])
    r4 = {r.event_day: r
          for r in events_anomaly_zscore(spark, sf).collect()}["2024-01-04"]
    assert r4.z_score == 1.0 and r4.is_anomaly is False


def test_zscore_types_are_independent_strata(spark, tmp_path):
    # type "b"'s single huge day must not contaminate type "a"'s stats
    sf = _day_counts(spark, tmp_path, [
        ("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("a", 4, 9),
        ("b", 1, 50),
    ])
    rows = events_anomaly_zscore(spark, sf).collect()
    a4 = [r for r in rows
          if r.event_type == "a" and r.event_day == "2024-01-04"][0]
    assert a4.z_score == 7.0
    b1 = [r for r in rows if r.event_type == "b"][0]
    assert b1.n_prev_days == 0 and b1.z_score is None


def _star_fixture(spark, tmp_path):
    _write(spark, tmp_path, "region",
           [(0, "ASIA"), (1, "EUROPE")],
           "r_regionkey int, r_name string")
    _write(spark, tmp_path, "nation",
           [(10, "CHINA", 0), (11, "JAPAN", 0), (20, "FRANCE", 1)],
           "n_nationkey int, n_name string, n_regionkey int")
    _write(spark, tmp_path, "customer",
           [(1, "c1", 10, 100.0, "B"),   # CHINA
            (2, "c2", 20, 100.0, "B")],  # FRANCE (region excluded)
           "c_custkey bigint, c_name string, c_nationkey int, "
           "c_acctbal double, c_mktsegment string")
    _write(spark, tmp_path, "supplier",
           [(5, "s5", 10, 0.0),    # CHINA — local for c1
            (6, "s6", 11, 0.0)],   # JAPAN — NOT local for c1
           "s_suppkey bigint, s_name string, s_nationkey int, "
           "s_acctbal double")
    _write(spark, tmp_path, "orders",
           [(100, 1, "O", 0.0, datetime(1996, 6, 1), "1-URGENT"),
            (101, 1, "O", 0.0, datetime(1999, 6, 1), "1-URGENT"),  # out of range
            (102, 2, "O", 0.0, datetime(1996, 6, 1), "1-URGENT")],  # EUROPE cust
           "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")
    li = "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, " \
         "l_linenumber int, l_quantity double, l_extendedprice double, " \
         "l_discount double, l_tax double, l_returnflag string, " \
         "l_linestatus string, l_shipdate timestamp"
    _write(spark, tmp_path, "lineitem", [
        # counted: order 100 (in range, ASIA cust), LOCAL supplier 5:
        # 1000 * (1-0.1) = 900.00
        (100, 1, 5, 1, 1.0, 1000.0, 0.10, 0.0, "N", "O", datetime(1996, 7, 1)),
        # counted: second local line: 200 * (1-0.0) = 200.00
        (100, 1, 5, 2, 1.0, 200.0, 0.00, 0.0, "N", "O", datetime(1996, 7, 1)),
        # NOT local (supplier in JAPAN != customer CHINA): excluded
        (100, 1, 6, 3, 1.0, 5000.0, 0.00, 0.0, "N", "O", datetime(1996, 7, 1)),
        # out-of-range order: excluded
        (101, 1, 5, 1, 1.0, 7000.0, 0.00, 0.0, "N", "O", datetime(1999, 7, 1)),
        # EUROPE-customer order: excluded
        (102, 1, 5, 1, 1.0, 9000.0, 0.00, 0.0, "N", "O", datetime(1996, 7, 1)),
    ], li)
    return str(tmp_path)


def test_regional_revenue_hand_computed(spark, tmp_path):
    sf = _star_fixture(spark, tmp_path)
    rows = agg_regional_revenue(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_name == "CHINA"
    assert r.revenue == 1100.0       # 900 + 200
    assert r.n_lineitems == 2


def _erasure_fixture(spark, tmp_path):
    _write(spark, tmp_path, "customer",
           [(1, "c1", 0, -5.0, "B"),    # flagged
            (2, "c2", 0, -0.01, "B"),   # flagged
            (3, "c3", 0, 10.0, "B"),    # clean
            (4, "c4", 0, None, "B")],   # NULL balance: NOT flagged
           "c_custkey bigint, c_name string, c_nationkey int, "
           "c_acctbal double, c_mktsegment string")
    _write(spark, tmp_path, "orders",
           [(100, 1, "O", 0.0, datetime(1996, 1, 1), "x"),
            (101, 2, "O", 0.0, datetime(1996, 1, 1), "x"),
            (102, 3, "O", 0.0, datetime(1996, 1, 1), "x"),   # clean cust
            (103, None, "O", 0.0, datetime(1996, 1, 1), "x")],  # NULL FK
           "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")
    li = "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, " \
         "l_linenumber int, l_quantity double, l_extendedprice double, " \
         "l_discount double, l_tax double, l_returnflag string, " \
         "l_linestatus string, l_shipdate timestamp"
    _write(spark, tmp_path, "lineitem", [
        (100, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(1996, 1, 2)),
        (100, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(1996, 1, 2)),
        (101, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(1996, 1, 2)),
        (102, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(1996, 1, 2)),
        (None, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(1996, 1, 2)),
    ], li)
    return str(tmp_path)


def test_erasure_cascade_hand_computed(spark, tmp_path):
    sf = _erasure_fixture(spark, tmp_path)
    rows = {r.table_name: r for r in pii_erasure_cascade(spark, sf).collect()}
    assert rows["customer"].depth == 1 and rows["customer"].n_rows == 2
    # orders 100 (cust 1) + 101 (cust 2); 102 clean, 103 NULL-FK dropped
    assert rows["orders"].depth == 2 and rows["orders"].n_rows == 2
    # lineitems of 100 (x2) + 101 (x1); 102's and the NULL-key row stay
    assert rows["lineitem"].depth == 3 and rows["lineitem"].n_rows == 3


def test_erasure_cascade_blast_radius_matches_executed_delete(spark, tmp_path):
    """The audit's counts must equal what an actually-executed cascade
    would remove (the advisor-vs-executed pattern from
    test_ranking_stats)."""
    sf = _erasure_fixture(spark, tmp_path)
    from debezium_nats_cdc_spark.io import load_table
    from pyspark.sql import functions as F

    flagged = (load_table(spark, sf, "customer")
               .filter(F.col("c_acctbal") < 0).select("c_custkey"))
    surviving_orders = (
        load_table(spark, sf, "orders")
        .join(flagged, F.col("o_custkey") == F.col("c_custkey"),
              "left_anti")
    )
    deleted_orders = load_table(spark, sf, "orders").count() \
        - surviving_orders.count()
    audited = {r.table_name: r.n_rows
               for r in pii_erasure_cascade(spark, sf).collect()}
    assert audited["orders"] == deleted_orders
