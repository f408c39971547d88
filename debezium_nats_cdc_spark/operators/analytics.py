"""Star-schema analytics reads over the columnar store (SURVEY §2.D/§2.C
adjacent — the multi-join + monitoring workloads the reference's
analytics tier exists to serve).

The reference lands its full event history in a columnar store expressly
for downstream analytical reads (`docs/system-design.md:130-134` —
"stores complete event history", "materialized views for real-time
aggregations"; `docs/design.md:166`).  Two canonical shapes of that
read-side workload that the catalog did not yet exercise:

  * the DEEP STAR JOIN — revenue attributed through a 6-table chain
    (fact → fact → dim → dim → tiny-dim → tiny-dim), the TPC-H Q5
    pattern.  This is the query that proves the join PLANNER story at
    100 TB: the two tiny dims collapse to one broadcast, the fact-side
    joins co-partition on their own keys, and the date predicate is
    pushed into the orders scan so the biggest table is pruned before
    any join runs.
  * the VOLUME ANOMALY MONITOR — a rolling z-score over the daily
    event-volume rollup (`docs/system-design.md:334-339` sizes capacity
    from exactly this daily-volume series).  The ingest-drop /
    ingest-spike alarm every CDC pipeline and every training-data
    ingest pages on.

Cross-engine determinism notes (the hard part of the z-score):
  * all window statistics accumulate EXACT integers — ``SUM(n)`` and
    ``SUM(n*n)`` over DECIMAL(18,0) daily counts — so the trailing mean/
    variance are derived in double from identical integers in both
    engines via the identical formula; no engine-resident stddev_samp
    (whose internal accumulation order may differ) is used;
  * variance uses ``GREATEST(var, 0)`` before SQRT: the textbook
    ``(Σn² − (Σn)²/k)/(k−1)`` cancellation can go −0.0000…1 in double
    when the trailing counts are constant;
  * the anomaly flag is computed from the ROUNDED z (4 dp via the
    engine-wide DECIMAL canonicalization), never from the raw double,
    so the boolean can't flip on a sub-ulp engine difference.

Scale notes:
  * regional revenue: one broadcast (nation⋈region, ≤ 25×5 rows at ANY
    scale), fact joins keyed on orderkey/custkey/suppkey — AQE picks
    broadcast vs shuffle for customer/supplier by measured size; the
    o_orderdate range predicate prunes the orders scan (PushedFilters).
  * anomaly monitor: the groupBy collapses events to ≤ (#types ×
    #days) rows BEFORE the window; the per-type trailing window then
    runs on a bounded frame (≤ #days rows per partition) — the window
    never sees raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import register
from ..io import load_table
from ._common import dec2, money_sum

_REVENUE_REGION = "ASIA"
_REVENUE_FROM = "1996-01-01 00:00:00"
_REVENUE_TO = "1997-01-01 00:00:00"

# anomaly monitor: trailing-window length (days), minimum history to
# score, and the |z| alarm threshold (2.5 σ ≈ 1.2% false-positive rate
# per day-type cell under normality).
_TRAIL_DAYS = 7
_MIN_HISTORY = 3
_Z_ALARM = 2.5


@register(
    "agg_regional_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
              AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = '{_REVENUE_REGION}'
      AND o_orderdate >= TIMESTAMP '{_REVENUE_FROM}'
      AND o_orderdate <  TIMESTAMP '{_REVENUE_TO}'
    GROUP BY n_name
    """,
    survey_ids=["C1", "D2"],
    doc="TPC-H Q5-shaped regional revenue: local-supplier revenue per "
        "nation through the full 6-table star chain — the deep multi-"
        "join read the reference's analytics store exists for "
        "(docs/system-design.md:130-134). The 'local supplier' cross-"
        "constraint (c_nationkey = s_nationkey) rides the supplier join "
        "as a second equi-key, so every join in the chain is hash-able; "
        "nation⋈region is pre-reduced by the region predicate and "
        "broadcast explicitly (≤ 25 rows at ANY scale); the orderdate "
        "range is pushed into the orders parquet scan so the largest "
        "join input is pruned at the source. Money sums on DECIMAL per "
        "the engine-wide parity rule.",
)
def agg_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_REVENUE_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_REVENUE_TO).cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nr = (
        load_table(spark, sf_dir, "nation")
        .join(
            load_table(spark, sf_dir, "region")
            .filter(F.col("r_name") == _REVENUE_REGION),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    disc_price = (
        dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    ).cast("decimal(18,4)")
    return (
        customer
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            money_sum(disc_price, scale4=True).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, event_day, n_events,
             COUNT(n_events) OVER pw AS k,
             CAST(SUM(CAST(n_events AS DECIMAL(18,0))) OVER pw
               AS DOUBLE) AS s1,
             CAST(SUM(CAST(n_events AS DECIMAL(18,0))
                      * CAST(n_events AS DECIMAL(18,0))) OVER pw
               AS DOUBLE) AS s2
      FROM d
      WINDOW pw AS (PARTITION BY event_type ORDER BY event_day
                    ROWS BETWEEN {_TRAIL_DAYS} PRECEDING AND 1 PRECEDING)
    ),
    z AS (
      SELECT event_type, event_day, n_events,
             CAST(k AS INT) AS n_prev_days,
             CASE WHEN k >= {_MIN_HISTORY}
                   AND SQRT(GREATEST((s2 - s1*s1/k)/(k-1), 0)) > 0
                  THEN CAST(CAST(ROUND(
                    (n_events - s1/k)
                    / SQRT(GREATEST((s2 - s1*s1/k)/(k-1), 0)), 4)
                  AS DECIMAL(18,4)) AS DOUBLE)
             END AS z_score
      FROM w
    )
    SELECT event_type, event_day, n_events, n_prev_days, z_score,
           CASE WHEN z_score IS NULL THEN NULL
                ELSE ABS(z_score) > {_Z_ALARM} END AS is_anomaly
    FROM z
    """,
    survey_ids=["D4", "H8"],
    doc="Rolling volume-anomaly monitor: per event type, each day's "
        "count scored against the trailing 7-day mean/stddev as a "
        "z-score, alarming at |z| > 2.5 — the ingest-drop/spike page "
        "derived from the same daily-volume series the reference sizes "
        "capacity from (docs/system-design.md:334-339). Cross-engine "
        "determinism: the trailing stats accumulate EXACT integers "
        "(Σn, Σn² on DECIMAL(18,0)) and mean/variance are derived in "
        "double by the identical formula in both engines — no engine-"
        "resident stddev aggregate whose accumulation order could "
        "differ; the alarm boolean comes from the ROUNDED z. Scale "
        "shape: events collapse to ≤ types×days rows before any window; "
        "the per-type trailing window runs on that bounded frame only. "
        "NULL event_type is kept as its own stratum (the 'und' "
        "convention); NULL ts rows are dropped (no day to bucket).",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    return zscore_daily(d)


def zscore_daily(d: DataFrame) -> DataFrame:
    """Score a (event_type, event_day, n_events) daily-count frame with
    the trailing-window z — the shared kernel behind the catalog query
    above and the streaming monitor (streaming/anomaly_monitor.py),
    which maintains the daily counts incrementally and re-scores this
    bounded frame (≤ types×days rows) per batch.  Keeping ONE scoring
    definition is what makes monitor-vs-batch parity testable
    rather than asserted."""
    pw = (
        W.partitionBy("event_type")
        .orderBy("event_day")
        .rowsBetween(-_TRAIL_DAYS, -1)
    )
    n_dec = F.col("n_events").cast("decimal(18,0)")
    w = d.select(
        "event_type", "event_day", "n_events",
        F.count("n_events").over(pw).alias("k"),
        F.sum(n_dec).over(pw).cast("double").alias("s1"),
        F.sum(n_dec * n_dec).over(pw).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")) / (
        F.col("k") - 1
    )
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = w.select(
        "event_type", "event_day", "n_events",
        F.col("k").cast("int").alias("n_prev_days"),
        F.when(
            (F.col("k") >= _MIN_HISTORY) & (std > 0),
            F.round((F.col("n_events") - F.col("s1") / F.col("k")) / std, 4)
            .cast("decimal(18,4)").cast("double"),
        ).alias("z_score"),
    )
    return z.select(
        "event_type", "event_day", "n_events", "n_prev_days", "z_score",
        F.when(F.col("z_score").isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.abs(F.col("z_score")) > _Z_ALARM)
        .alias("is_anomaly"),
    )
