"""Aggregation operators (SURVEY.md §2.D + free set/grouping ops).

The reference's aggregation surface: real-time materialized-view aggs over
the columnar event store (docs/system-design.md:130-134), metrics counters
by event type (docs/design.md:588-596), and daily volume rollups
(docs/system-design.md:334-339).  Mapped here onto the driver testdata
star schema / events stream.

Scale notes: every query below is a single shuffle (partial aggregation
map-side first — Spark's hash aggregate always does this for algebraic
aggs), group-by keys are low-cardinality so AQE coalesces post-shuffle
partitions; no driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..io import load_table
from ._common import dec2, money_sum


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ids=["D2", "D4"],
    doc="TPC-H Q1-shaped pricing summary: the canonical event-store rollup.",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast("decimal(18,4)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            money_sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            money_sum(disc_price, scale4=True).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_daily_event_volume",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS event_day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    survey_ids=["D4", "D2"],
    doc="Daily event volume by category — reference capacity-plan rollup "
        "(docs/system-design.md:334-339).",
)
def agg_daily_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
            "event_type",
        ).agg(
            F.count("*").alias("n_events"),
            money_sum(dec2("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "agg_metrics_by_type",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
    survey_ids=["D3"],
    doc="events.published.total-style counters tagged by type "
        "(docs/design.md:588-596).",
)
def agg_metrics_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "agg_rollup_region_nation",
    oracle="""
    SELECT r_name, n_name,
           CAST(COUNT(c_custkey) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_acctbal
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    survey_ids=["D2"],
    doc="Hierarchical rollup (region ⊃ nation) — free via ROLLUP; "
        "subtotal semantics match ANSI.",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("c_custkey").alias("n_customers"),
        money_sum(dec2("c_acctbal")).cast("double").alias("total_acctbal"),
    )


@register(
    "agg_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    -- empty-input-only guard (fuzz --empty find, r6): SQL-standard CUBE
    -- over an empty relation yields the grand-total grouping-set row
    -- (DuckDB does) while Spark emits no rows; on any non-empty input
    -- every grouping set has COUNT(*) >= 1 so this HAVING is a no-op.
    HAVING COUNT(*) > 0
    """,
    survey_ids=["D2"],
    doc="CUBE over order dimensions — exposed for free (SURVEY §2.D note).",
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        money_sum(dec2("o_totalprice")).cast("double").alias("total_price"),
    )


@register(
    "agg_grouping_sets_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    -- empty-input-only guard (same class as agg_cube_orders): the ()
    -- grouping set emits a grand-total row over an empty relation in
    -- DuckDB while Spark emits none
    HAVING COUNT(*) > 0
    """,
    survey_ids=["D2"],
    doc="Explicit GROUPING SETS (status marginals + priority marginals "
        "+ grand total, skipping the full cross) with grouping_id so "
        "consumers — and the oracle hash — distinguish NULL-from-data "
        "from NULL-from-aggregation.  Cheaper than CUBE when only some "
        "marginals are wanted: Spark expands exactly the listed sets.",
)
def agg_grouping_sets_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count("*").cast("bigint").alias("n_orders"),
        money_sum(dec2("o_totalprice")).cast("double").alias("total_price"),
    )


@register(
    "agg_pivot_returnflag",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS DOUBLE) AS "O",
           CAST(CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS DOUBLE) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ids=["D2"],
    doc="Pivot linestatus → columns; conditional-agg equivalent in the oracle.",
)
def agg_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(money_sum(dec2("l_quantity")))
        .select("l_returnflag", F.col("O").cast("double").alias("O"),
                F.col("F").cast("double").alias("F"))
    )
