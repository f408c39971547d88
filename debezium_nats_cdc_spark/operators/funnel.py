"""Event-sequence analytics over the event store: funnel conversion and
cohort retention (SURVEY §2.D adjacent — the read-side workloads the
reference's analytics store exists to answer).

The reference persists the complete event history into a columnar
analytics store precisely so downstream teams can ask behavioral
questions of it (`docs/system-design.md:131-134` — "stores complete
event history", "materialized views for real-time aggregations";
`docs/design.md:166` — "store all events for analytics").  The two
classic shapes of that workload are

  * the strict-order FUNNEL — of the users who did A, how many went on
    to do B after A, then C after B, and how fast; and
  * the COHORT-RETENTION matrix — of the users first seen in week W,
    how many were still active k weeks later.

Both are expressed so every shuffle is keyed on ``user_id`` (funnel) or
collapses to a bounded frame (retention matrix: one row per
cohort-week × offset pair, ≤ weeks² rows at ANY corpus size):

  * The funnel's stage-k frame is a per-user MIN aggregate joined back
    to the next stage's events on ``user_id`` — the same key every
    time, so a cluster co-partitions all three stages off one exchange
    family; nothing ever shuffles more than the per-user stage
    timestamps.  No window over unpartitioned data, no collect.
  * Retention derives each user's cohort week with a window over
    ``user_id`` on the already-distinct (user, week) frame (bounded at
    #weeks rows per key), then aggregates to the matrix; the
    cohort-size denominator is a window over ``cohort_week`` on the
    matrix itself (bounded), NOT a second pass over events.

Timestamp deltas aggregate as exact integer microseconds (SUM of longs,
order-independent); only the final avg division runs in double, on
identical inputs in both engines, rounded through the engine-wide
DECIMAL canonicalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import register
from ..io import load_table

# The strict-order stage sequence: view -> click -> purchase, the
# browse-to-buy path through the synthetic event taxonomy.
_FUNNEL_STAGES = ["view", "click", "purchase"]


def _stage_row(stage_df: DataFrame, stage: int, name: str) -> DataFrame:
    """One funnel-summary row from a per-user stage frame.

    ``stage_df`` has one row per user who reached the stage, with
    ``t_cur`` (this stage's first qualifying event) and, from stage 2
    on, ``t_prev`` (the previous stage's timestamp it had to follow).
    The delta sum is exact long microseconds; avg = sum/n/1e6 in double
    then 3dp-DECIMAL-canonicalized, mirrored verbatim in the oracle.
    """
    if stage == 1:
        delay = F.lit(None).cast("double")
    else:
        # events.ts loads as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP.
        # The cast interprets NTZ in the session tz — UTC in this
        # engine (session.py pins it; UTC has no DST), so the DELTA of
        # two identically-cast values equals the naive microsecond diff
        # the oracle's date_diff('microsecond', ...) computes.  A caller
        # whose time column is ALREADY long microseconds (the streaming
        # funnel monitor's state) passes through unchanged.
        def us(c: str):
            col = F.col(c)
            if dict(stage_df.dtypes).get(c) == "bigint":
                return col
            return F.unix_micros(col.cast("timestamp"))

        delay = (
            F.round(
                F.sum(us("t_cur") - us("t_prev"))
                 .cast("double") / F.count("*") / F.lit(1000000.0),
                3,
            ).cast("decimal(18,3)").cast("double")
        )
    return stage_df.agg(
        F.count("*").cast("bigint").alias("n_users"),
        delay.alias("avg_secs_from_prev"),
    ).select(
        F.lit(stage).cast("int").alias("stage"),
        F.lit(name).alias("event_type"),
        "n_users",
        "avg_secs_from_prev",
    )


def funnel_summary(base: DataFrame,
                   stages: list[str] | None = None) -> DataFrame:
    """The shared strict-order funnel kernel: per stage, how many users
    reached it and the average seconds from the previous stage.

    ``base`` carries (``user_id``, ``event_type``, ``ts``) with NULLs
    already dropped; ``ts`` may be a timestamp OR long microseconds —
    min/strictly-greater ordering is identical either way, so the batch
    catalog query (timestamps straight off the event store) and the
    streaming funnel monitor (micros-valued incremental state) score
    with the SAME code, the test-pinned-parity pattern of
    analytics.zscore_daily / streaming.anomaly_monitor.

    Scale shape: stage 1 is a per-user MIN aggregate; each later stage
    joins the next event slice back on ``user_id`` — the SAME key every
    time, so all stages share one co-partitioning and nothing wider
    than per-user stage times ever shuffles.
    """
    stages = stages or _FUNNEL_STAGES
    rows = []
    prev: DataFrame | None = None
    for i, name in enumerate(stages, start=1):
        slice_i = base.filter(F.col("event_type") == name)
        if prev is None:
            cur = slice_i.groupBy("user_id").agg(F.min("ts").alias("t_cur"))
        else:
            cur = (
                slice_i
                .join(prev.select("user_id",
                                  F.col("t_cur").alias("t_gate")),
                      "user_id")
                .filter(F.col("ts") > F.col("t_gate"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t_cur"),
                     F.min("t_gate").alias("t_prev"))
            )
        rows.append(_stage_row(cur, i, name))
        prev = cur
    out = rows[0]
    for s in rows[1:]:
        out = out.unionByName(s)
    return out


@register(
    "events_funnel_conversion",
    oracle="""
    WITH base AS (
      SELECT user_id, event_type, ts FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    s1 AS (
      SELECT user_id, MIN(ts) AS t_cur
      FROM base WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT b.user_id, MIN(b.ts) AS t_cur, MIN(s1.t_cur) AS t_prev
      FROM base b JOIN s1 ON b.user_id = s1.user_id
      WHERE b.event_type = 'click' AND b.ts > s1.t_cur
      GROUP BY b.user_id
    ),
    s3 AS (
      SELECT b.user_id, MIN(b.ts) AS t_cur, MIN(s2.t_cur) AS t_prev
      FROM base b JOIN s2 ON b.user_id = s2.user_id
      WHERE b.event_type = 'purchase' AND b.ts > s2.t_cur
      GROUP BY b.user_id
    )
    SELECT CAST(1 AS INT) AS stage, 'view' AS event_type,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users,
           CAST(NULL AS DOUBLE) AS avg_secs_from_prev
    UNION ALL
    SELECT CAST(2 AS INT), 'click',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2),
           (SELECT CAST(CAST(ROUND(
              CAST(SUM(date_diff('microsecond', t_prev, t_cur)) AS DOUBLE)
              / COUNT(*) / 1000000.0, 3) AS DECIMAL(18,3)) AS DOUBLE)
            FROM s2)
    UNION ALL
    SELECT CAST(3 AS INT), 'purchase',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3),
           (SELECT CAST(CAST(ROUND(
              CAST(SUM(date_diff('microsecond', t_prev, t_cur)) AS DOUBLE)
              / COUNT(*) / 1000000.0, 3) AS DECIMAL(18,3)) AS DOUBLE)
            FROM s3)
    """,
    survey_ids=["D1", "D2"],
    doc="Strict-order funnel over the event history "
        "(view -> click-after-view -> purchase-after-click): per stage, "
        "how many users reached it and the average seconds from the "
        "previous stage — the composite-business-event question the "
        "reference's analytics store answers off the complete history "
        "(docs/system-design.md:131-134, docs/design.md:166). "
        "Strictness is per-user timestamp ordering (stage k counts only "
        "events strictly after the user's stage k-1 time), not mere "
        "per-type counts. Scale shape: stage 1 is a per-user MIN "
        "aggregate; each later stage joins the next event slice back on "
        "user_id — the SAME key every time, so all three stages share "
        "one co-partitioning and nothing wider than per-user stage "
        "times ever shuffles. Delta sums are exact long microseconds; "
        "the final one-row summaries are unions of single-row "
        "aggregates.",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts")
    )
    return funnel_summary(base)


@register(
    "events_cohort_retention",
    oracle="""
    WITH uw AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id, CAST(date_trunc('week', ts) AS DATE)
    ),
    c AS (
      SELECT user_id, wk,
             MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
      FROM uw
    ),
    m AS (
      SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
             CAST(date_diff('day', cohort_wk, wk) / 7 AS INT)
               AS offset_weeks,
             CAST(COUNT(*) AS BIGINT) AS n_active
      FROM c GROUP BY 1, 2
    )
    SELECT cohort_week, offset_weeks, n_active,
           MAX(CASE WHEN offset_weeks = 0 THEN n_active END)
             OVER (PARTITION BY cohort_week) AS cohort_size,
           CAST(CAST(ROUND(
             CAST(n_active AS DOUBLE)
             / MAX(CASE WHEN offset_weeks = 0 THEN n_active END)
                 OVER (PARTITION BY cohort_week), 4)
           AS DECIMAL(18,4)) AS DOUBLE) AS retained_pct
    FROM m
    """,
    survey_ids=["D2", "D4"],
    doc="Weekly cohort-retention matrix over the event history: users "
        "grouped by the week they were FIRST seen (any event type), "
        "then, per cohort, how many were active 0..k weeks later and "
        "the retained fraction vs the cohort's own week-0 size — the "
        "canonical longitudinal read off the complete event history the "
        "reference's analytics store keeps (docs/system-design.md:131-"
        "134; 5-year retention at docs/system-design.md:330 exists for "
        "exactly this kind of look-back). Scale shape: one distinct "
        "(user, week) aggregate over events; the cohort week is a "
        "window over user_id on that bounded frame (<= #weeks rows per "
        "user), NOT a join back to events; the matrix aggregate and the "
        "cohort-size window both run on <= weeks^2 rows at ANY corpus "
        "size. Weeks are Monday-truncated in both engines, so the "
        "day-diff is an exact multiple of 7.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    uw = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        )
        .distinct()
    )
    return cohort_matrix(uw)


def cohort_matrix(uw: DataFrame) -> DataFrame:
    """The cohort-retention matrix over a distinct (user_id, wk) frame —
    the SHARED scoring kernel (r12 consolidation, VERDICT r11 task 5):
    the batch ``events_cohort_retention`` runs it over the events
    table's frame, the streaming ``CohortMonitor.scored`` over its
    accumulated state, so the two can never drift (the dau_wau /
    funnel_summary pattern).  <= weeks^2 result rows at any corpus
    size; the cohort window runs over <= #weeks rows per user, never
    events."""
    c = uw.withColumn(
        "cohort_wk", F.min("wk").over(W.partitionBy("user_id"))
    )
    m = (
        c.groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort_wk") / 7).cast("int")
             .alias("offset_weeks"),
        )
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    w_cohort = W.partitionBy("cohort_week")
    cohort_size = F.max(
        F.when(F.col("offset_weeks") == 0, F.col("n_active"))
    ).over(w_cohort)
    return m.select(
        "cohort_week", "offset_weeks", "n_active",
        cohort_size.alias("cohort_size"),
        F.round(F.col("n_active").cast("double") / cohort_size, 4)
         .cast("decimal(18,4)").cast("double").alias("retained_pct"),
    )
