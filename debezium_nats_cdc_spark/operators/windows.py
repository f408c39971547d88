"""Window / ordering operators (SURVEY.md §2.E + F6 audit diff).

E2 latest-state-per-key is THE flagship CDC operator: reconstruct current
row state from a change stream (docs/cdc-guide.md:137-149,
docs/system-design.md:718).  E3 is the audit timeline (lag over per-entity
history, docs/design.md:185-197).

Scale notes: all windows partition by a key (user_id / custkey) — state
for one key never crosses partitions, so these scale linearly with
executors; ordering keys include a unique tiebreaker (event_id/orderkey)
so results are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import register
from ..io import load_table
from ._common import dec2


@register(
    "window_latest_state_per_key",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value, ts AS last_ts
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    survey_ids=["E2", "H1"],
    doc="CDC materialization core: latest event per key via row_number "
        "(partition by pk, order by event-time desc + unique offset desc). "
        "At 100 TB this is one hash shuffle on the key; no global sort.",
)
def window_latest_state_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice AS total_price,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
    survey_ids=["E2"],
    doc="Top-K per group — rank-filter pattern; deterministic tiebreak.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("total_price"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
    survey_ids=["E3", "E1"],
    doc="Cumulative per-entity measure over event time (audit-timeline "
        "shape). DECIMAL accumulation → associative, order-stable.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec2("o_totalprice")).over(w).cast("decimal(38,2)").cast("double")
        .alias("running_spend"),
    )


@register(
    "window_lag_timeline",
    oracle="""
    SELECT user_id, event_id, ts, value, prev_value,
           (prev_value IS NOT NULL AND prev_value <> value) AS changed
    FROM (
      SELECT user_id, event_id, ts, value,
             LAG(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_value
      FROM events)
    """,
    survey_ids=["E3", "F6"],
    doc="Per-entity previous-value timeline — the audit_trail old_value/"
        "new_value semantics (docs/design.md:185-197) via LAG — WITH the "
        "field-changed flag (r12 consolidation of the former "
        "window_field_diff_audit, whose output is a pure projection of "
        "this one: filter changed, rename old/new — so one window pass "
        "verifies both contracts; the CDC structwise path stays in "
        "operators/audit.py).",
)
def window_lag_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        prev.alias("prev_value"),
    ).withColumn(
        "changed",
        F.col("prev_value").isNotNull()
        & (F.col("prev_value") != F.col("value")),
    )


def window_field_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level change extraction: audit_trail rows with old/new
    value per changed field (docs/design.md:185-197).  Since r12 a pure
    PROJECTION of the registered ``window_lag_timeline`` (its catalog
    twin was retired in the r12 consolidation — the timeline's
    ``changed`` flag is this filter, so one driver row verifies both
    contracts); the CDC path still runs structwise on before/after in
    operators/audit.py."""
    return (
        window_lag_timeline(spark, sf_dir)
        .filter(F.col("changed"))
        .select(
            F.col("user_id").alias("entity_id"),
            F.lit("value").alias("field"),
            F.col("ts").alias("changed_at"),
            F.col("prev_value").alias("old_value"),
            F.col("value").alias("new_value"),
        )
    )


_NTILE_BUCKETS = 4


@register(
    "window_ntile_curriculum",
    oracle=f"""
    SELECT lang, CAST(quartile AS INT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM (
      SELECT lang, n_chars,
             NTILE({_NTILE_BUCKETS}) OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id) AS quartile
      FROM documents)
    GROUP BY lang, quartile
    """,
    survey_ids=["E2", "K3"],
    doc="Length-curriculum bucketing: per-language NTILE(4) over doc "
        "length (deterministic doc_id tiebreak), then bucket stats — the "
        "assignment step of curriculum sampling (long-doc quartile "
        "first). Windows are PARTITIONED by lang, so each language sorts "
        "independently in its own tasks: no global sort, no single-"
        "partition window collapse at 100 TB. A corpus-wide (unpartition"
        "ed) ranking would instead use approx quantile boundaries + a "
        "broadcast range lookup.",
)
def window_ntile_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("quartile", F.ntile(_NTILE_BUCKETS).over(w))
        .groupBy("lang", "quartile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "window_state_as_of",
    oracle="""
    WITH cut AS (SELECT MAX(ts) - INTERVAL 3 DAY AS cutoff FROM events)
    SELECT user_id, event_id AS asof_event_id,
           event_type AS asof_event_type,
           value AS asof_value, ts AS asof_ts
    FROM events CROSS JOIN cut
    WHERE ts <= cutoff
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    survey_ids=["E2", "E4", "H1"],
    doc="Event-sourcing time travel: the materialized state each entity "
        "had AS OF a cutoff instant — replay events <= T, keep the "
        "latest per key. The batch twin of E4's ordered replay "
        "(rebuilding read-model state at any past point is the event "
        "store's core promise). Scale shape: the ts predicate prunes "
        "event-store partitions (clustered by month at rest) before "
        "any shuffle; then the same single hash shuffle as "
        "latest-state-per-key. The cutoff here derives from max(ts) "
        "(a 1-row broadcast) so the query is stable on static testdata; "
        "production passes a literal timestamp and the scan prunes "
        "statically.",
)
def window_state_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cut = e.agg((F.max("ts") - F.expr("INTERVAL 3 DAYS")).alias("cutoff"))
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.crossJoin(F.broadcast(cut))
        .filter(F.col("ts") <= F.col("cutoff"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("asof_event_id"),
            F.col("event_type").alias("asof_event_type"),
            F.col("value").alias("asof_value"),
            F.col("ts").alias("asof_ts"),
        )
    )
