"""Advanced composition operators: as-of join, sessionization, exact
percentiles, per-entity tenure, scalar-function showcase.

These round out SURVEY.md §2's E/G/D families plus the training-pipeline
patterns the guide calls out (as-of join, sessionization) — each built
from DataFrame primitives, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import register
from ..io import load_table
from ._common import dec2
from .similarity import _sql_cos


@register(
    "join_asof_last_click",
    oracle="""
    SELECT p_event_id, p_ts, user_id, last_click_id, last_click_ts
    FROM (
      SELECT p.event_id AS p_event_id, p.ts AS p_ts, p.user_id,
             c.event_id AS last_click_id, c.ts AS last_click_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM events p JOIN events c
        ON p.user_id = c.user_id AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL 1 DAY
      WHERE p.event_type = 'purchase' AND c.event_type = 'click')
    WHERE rn = 1
    """,
    survey_ids=["C6", "E2"],
    doc="As-of join (Spark has no native one): for each purchase, the "
        "most recent click by the same user within a 1-day tolerance. "
        "Union-tag-scan formulation: tag both sides, ONE shuffle+sort on "
        "(user_id, ts), last(click, ignorenulls) carries the latest click "
        "forward to each purchase row — O(P+C) per user vs the banded "
        "self-join's O(P*C) blow-up on active keys (the skew that kills "
        "attribution joins at 100 TB). Tolerance applied as a post-scan "
        "filter. Ties (click at purchase ts) sort clicks first so "
        "c.ts <= p.ts inclusive semantics hold.",
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # NULL user_ids must drop: the window's partitionBy would group them
    # into ONE partition and attribute NULL-user purchases to NULL-user
    # clicks, where equi-join semantics (the oracle, and any sane
    # attribution) match nothing.  Found by differential fuzz seed 150
    # the round the generator learned to emit 'purchase' events
    # (BENCHLOG round 10) — before that the fuzz result was vacuously
    # empty and the divergence invisible.
    tagged = e.filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    ).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == F.lit("purchase")).alias("is_p"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("c_ts"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("c_id"),
    )
    # clicks (is_p=false) sort before purchases at equal ts; within a
    # click tie, ascending event_id => last() picks the max event_id,
    # matching the argmax-by-(ts, event_id) contract of the oracle.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("last_click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .withColumn("last_click_id", F.last("c_id", ignorenulls=True).over(w))
        .filter(
            F.col("is_p")
            & (F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 DAY"))
        )
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("ts").alias("p_ts"),
            "user_id",
            F.col("last_click_id").alias("last_click_id"),
            F.col("last_click_ts").alias("last_click_ts"),
        )
    )


@register(
    "cdc_sessionization",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
    survey_ids=["H7", "D1"],
    doc="Gap-based sessionization (30-min inactivity): lag -> flag -> "
        "running-sum session id -> per-session rollup. One shuffle on "
        "user_id shared by all three windows. Streaming twin: "
        "session_window(ts, '30 minutes').",
)
def cdc_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = W.partitionBy("user_id").orderBy("ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.col("ts") - F.lag("ts").over(w_order) > F.expr("INTERVAL 30 MINUTES"),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return sess.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "text_length_percentiles",
    oracle="""
    SELECT lang,
           CAST(CAST(ROUND(quantile_cont(n_chars, 0.5), 4) AS DECIMAL(18,4)) AS DOUBLE) AS p50,
           CAST(CAST(ROUND(quantile_cont(n_chars, 0.9), 4) AS DECIMAL(18,4)) AS DOUBLE) AS p90,
           CAST(CAST(ROUND(quantile_cont(n_chars, 0.99), 4) AS DECIMAL(18,4)) AS DOUBLE) AS p99
    FROM documents GROUP BY lang
    """,
    survey_ids=["K3", "D2"],
    doc="Exact interpolated percentiles of document length per language "
        "(corpus length-distribution audit). percentile() ≙ quantile_cont; "
        "at 100 TB switch to percentile_approx (t-digest, mergeable).",
)
def text_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        *[
            F.round(F.percentile("n_chars", q), 4).cast("decimal(18,4)").cast("double").alias(name)
            for q, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
        ]
    )


@register(
    "cdc_tenure_per_user",
    oracle="""
    SELECT user_id,
           CAST(date_diff('day', MIN(ts), MAX(ts)) AS BIGINT) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS first_seen, MAX(ts) AS last_seen
    FROM events GROUP BY user_id
    """,
    survey_ids=["D5", "G10"],
    doc="Tenure/derived scalar during enrichment (terminate->tenure calc, "
        "docs/system-design.md:219): per-entity date math over event span.",
)
def cdc_tenure_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.datediff(F.max("ts"), F.min("ts")).cast("bigint").alias("active_days"),
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )


@register(
    "scalar_functions_showcase",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y%m') AS order_month,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           lower(o_orderpriority) AS priority_lc,
           'ord.' || lower(o_orderstatus) || '.' || CAST(o_orderkey % 10 AS VARCHAR)
             AS routing_subject,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CAST(CAST(ROUND(o_totalprice, 0) AS DECIMAL(18,0)) AS BIGINT) AS price_rounded
    FROM orders
    """,
    survey_ids=["G1", "G2", "G4", "G6", "G7"],
    doc="Scalar-function family (SURVEY §2.G): month bucketing (toYYYYMM "
        "analog), date arithmetic, lower/concat subject building, "
        "coalesce/nullif, rounding — all JVM-side codegen'd.",
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMM").alias("order_month"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd")
        .alias("due_date"),
        F.lower("o_orderpriority").alias("priority_lc"),
        F.concat_ws(
            ".",
            F.lit("ord"),
            F.lower("o_orderstatus"),
            (F.col("o_orderkey") % 10).cast("string"),
        ).alias("routing_subject"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_label"),
        F.round("o_totalprice", 0).cast("decimal(18,0)").cast("bigint").alias("price_rounded"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           (abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
                - COUNT(DISTINCT user_id)) / COUNT(DISTINCT user_id) <= 0.2)
             AS approx_within_20pct
    FROM events GROUP BY event_type
    """,
    survey_ids=["D2"],
    doc="approx_count_distinct (HLL, rsd 5%): the mergeable-sketch path "
        "100 TB distinct counts where exact COUNT(DISTINCT) would "
        "shuffle every key. HLL registers are engine-specific, so the "
        "cross-engine contract checked here is semantic: exact counts "
        "match AND each engine's own sketch lands within a 20%% (4-sigma "
        "at rsd 0.05) envelope — wide enough that two INDEPENDENT "
        "sketches virtually never straddle the boundary, so the boolean "
        "compares equal across engines (a tight 1-sigma bound would "
        "hash-mismatch whenever one engine's estimate is merely "
        "average-bad).",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id").cast("double")
    exact = F.countDistinct("user_id")
    return e.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (F.abs(approx - exact) / exact <= 0.2).alias("approx_within_20pct"),
    )


@register(
    "mm_doc_embedding_join",
    # _sql_cos: guarded cosine shared with the sim_* oracles — NULL (not
    # -1.0, not an error) for zero/NULL/empty vectors, like try_divide
    oracle=f"""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           CAST(len(e.embedding) AS INT) AS embedding_dim,
           CAST(CAST(ROUND({_sql_cos('e.embedding', 'e.embedding')}, 4)
                AS DECIMAL(10,4)) AS DOUBLE) AS self_cos
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    survey_ids=["K4", "C1"],
    doc="Multimodal record assembly: join text metadata with its "
        "embedding into one typed row (the {text, embedding, props} "
        "struct column pattern, flattened here for oracle parity).",
)
def mm_doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine_similarity

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "label",
            F.size("embedding").cast("int").alias("embedding_dim"),
            F.round(cosine_similarity("embedding", "embedding"), 4)
            .cast("decimal(10,4)")
            .cast("double")
            .alias("self_cos"),
        )
    )
