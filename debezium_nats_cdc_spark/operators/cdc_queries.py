"""CDC-shaped operators on the driver testdata (SURVEY.md §2.A/B/F/G/H).

The testdata ``events`` table stands in for the CDC stream (TESTDATA role
mapping in FIXTURES.md §4): event_type ≙ routing subject tail, ts ≙ ts_ms,
props ≙ JSON payload.  The real Debezium-envelope path (typed before/after
structs, the golden workload) lives in sources/cdc.py + operators/rules.py
and is exercised by tests/; these catalog entries prove the same operator
semantics against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..functions.subjects import subject_match
from ..io import load_table
from ._common import dec2, money_sum

def _subject():
    # lazy: Column construction needs an active session (classic mode)
    return F.concat_ws(
        ".", F.lit("HCM"), F.lit("CDC"), F.lit("HR"), F.lit("hrdb"), F.col("event_type")
    )


@register(
    "cdc_subject_route",
    oracle="""
    SELECT event_id, 'HCM.CDC.HR.hrdb.' || event_type AS subject
    FROM events
    WHERE regexp_matches('HCM.CDC.HR.hrdb.' || event_type,
                         '^HCM\\.CDC\\.HR\\.[^.]+\\.purchase$')
    """,
    survey_ids=["B3", "A4", "G6"],
    doc="NATS wildcard subject routing (HCM.CDC.HR.*.purchase): glob "
        "compiled to an anchored regex / startswith predicate "
        "(config/debezium/application.properties:23, docs/design.md:83-110).",
)
def cdc_subject_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("subject", _subject())
    return e.filter(subject_match("subject", "HCM.CDC.HR.*.purchase")).select(
        "event_id", "subject"
    )


@register(
    "cdc_envelope_build",
    oracle="""
    SELECT md5('evt-' || CAST(event_id AS VARCHAR)) AS event_uid,
           CASE WHEN event_type = 'purchase' THEN 'transaction'
                WHEN event_type IN ('click','view') THEN 'engagement'
                WHEN event_type = 'signup' THEN 'lifecycle'
                ELSE 'system' END AS event_category,
           upper(substr(event_type, 1, 1)) || substr(event_type, 2) AS event_type_name,
           'events.hr.' ||
             (CASE WHEN event_type = 'purchase' THEN 'transaction'
                   WHEN event_type IN ('click','view') THEN 'engagement'
                   WHEN event_type = 'signup' THEN 'lifecycle'
                   ELSE 'system' END) || '.' || lower(event_type) AS subject,
           CAST(user_id AS VARCHAR) AS aggregate_id,
           ts AS event_timestamp,
           strftime(ts, '%Y%m') AS event_month
    FROM events
    """,
    survey_ids=["G4", "G5", "G6", "G7", "A8"],
    doc="Domain-envelope construction (docs/system-design.md:189-209): "
        "deterministic uid (md5 of natural key, not uuid() — reproducible), "
        "category mapping, events.hr.<category>.<type> subject "
        "(docs/design.md:600-605), toYYYYMM partition column "
        "(docs/design.md:182).",
)
def cdc_envelope_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    category = (
        F.when(F.col("event_type") == "purchase", "transaction")
        .when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type") == "signup", "lifecycle")
        .otherwise("system")
    )
    return e.select(
        F.md5(F.concat(F.lit("evt-"), F.col("event_id").cast("string"))).alias("event_uid"),
        category.alias("event_category"),
        F.concat(
            F.upper(F.substring("event_type", 1, 1)),
            F.expr("substr(event_type, 2)"),
        ).alias("event_type_name"),
        F.concat_ws(
            ".", F.lit("events"), F.lit("hr"), category, F.lower(F.col("event_type"))
        ).alias("subject"),
        F.col("user_id").cast("string").alias("aggregate_id"),
        F.col("ts").alias("event_timestamp"),
        F.date_format("ts", "yyyyMM").alias("event_month"),
    )


@register(
    "cdc_dedup_exact",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
      SELECT DISTINCT * FROM (
        SELECT * FROM events UNION ALL SELECT * FROM events))
    GROUP BY event_type
    """,
    survey_ids=["A6", "F3"],
    doc="Broker/consumer duplicate suppression (JetStream 120s window, "
        "config/nats/stream.json:14; consumer idempotency docs/system-"
        "design.md:381-388): duplicated delivery collapses to exactly-once "
        "counts. Streaming twin: dropDuplicatesWithinWatermark (streaming/).",
)
def cdc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    redelivered = e.unionByName(e)  # simulate at-least-once redelivery
    return (
        redelivered.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "cdc_retention_filter",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_retained
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
    GROUP BY event_type
    """,
    survey_ids=["F7", "A5"],
    doc="Retention/TTL pruning (JetStream max_age, binlog expire_logs_days=7 "
        "— config/nats/stream.json:9, config/mariadb/my.cnf:9): age predicate "
        "= partition filter on the month-partitioned store; scans only "
        "surviving partitions.",
)
def cdc_retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cutoff = e.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cut"))
    return (
        e.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("cut"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_retained"))
    )


@register(
    "cdc_validate_split",
    oracle="""
    SELECT event_type,
           (value IS NOT NULL AND value >= 0
            AND TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL)
             AS is_valid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
    survey_ids=["F4"],
    doc="Schema/business validation with accept/reject split (docs/design."
        "md:146,640-641; DLQ docs/system-design.md:373,400): required-field "
        "and payload checks as one pass; invalid branch feeds dead_letter.",
)
def cdc_validate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    is_valid = F.col("value").isNotNull() & (F.col("value") >= 0) & k.isNotNull()
    return e.groupBy("event_type", is_valid.alias("is_valid")).agg(
        F.count("*").alias("n")
    )


@register(
    "cdc_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
    """,
    survey_ids=["B2", "G8"],
    doc="JSON field-path extraction from payload columns "
        "(docs/cdc-guide.md:96-100; payload-as-JSON docs/design.md:177-178).",
)
def cdc_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select("event_id", k.alias("k")).filter(F.col("k") >= 50)


@register(
    "cdc_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    survey_ids=["H7", "D1"],
    doc="Tumbling-window composite aggregation (TeamCompositionChanged "
        "rollup shape, docs/design.md:262): batch analog of the streaming "
        "window() agg in streaming/pipeline.py.",
)
def cdc_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        ).agg(
            F.count("*").alias("n_events"),
            money_sum(dec2("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "cdc_masking_pii",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_hash,
           substr(c_name, 1, 9) || '***' AS name_masked,
           c_mktsegment
    FROM customer
    """,
    survey_ids=["B7"],
    doc="PII masking projection (docs/design.md:883-884): deterministic "
        "hash + partial redaction, config-driven column list in practice.",
)
def cdc_masking_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_hash"),
        F.concat(F.substring("c_name", 1, 9), F.lit("***")).alias("name_masked"),
        "c_mktsegment",
    )


@register(
    "cdc_union_heterogeneous",
    oracle="""
    SELECT 'customer' AS src, c_name AS entity_name,
           c_acctbal AS acctbal, c_nationkey AS nation_key
    FROM customer
    UNION ALL
    SELECT 'supplier' AS src, s_name AS entity_name,
           s_acctbal AS acctbal, s_nationkey AS nation_key
    FROM supplier
    """,
    survey_ids=["F1", "A9"],
    doc="Union of heterogeneous inputs after envelope normalization "
        "(CDC ∪ external subjects, docs/design.md:83-91) — "
        "unionByName(allowMissingColumns) in the streaming path.",
)
def cdc_union_heterogeneous(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").alias("nation_key"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"),
        F.col("s_name").alias("entity_name"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nation_key"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "cdc_set_intersect",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    INTERSECT
    SELECT s_nationkey AS nation_key FROM supplier
    """,
    survey_ids=["F1"],
    doc="INTERSECT (exposed free via Spark SQL set ops — SURVEY §2.F note).",
)
def cdc_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nation_key"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nation_key"))
    return c.intersect(s)


@register(
    "cdc_set_except",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    EXCEPT
    SELECT s_nationkey AS nation_key FROM supplier
    """,
    survey_ids=["F1"],
    doc="EXCEPT (exposed free via Spark SQL set ops).",
)
def cdc_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nation_key"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nation_key"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics
