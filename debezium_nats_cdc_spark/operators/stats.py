"""Data-distribution diagnostics (SURVEY.md §2.K / §4 — the planning
inputs a 100 TB deployment reads BEFORE choosing join and partitioning
strategies).

The reference sizes its streams from capacity estimates
(docs/system-design.md:334-342); at lake scale the equivalent is
measuring the actual key distribution.  `stats_key_skew_report` is the
pre-join check that decides whether `join_salted_skew`'s threshold (or
AQE skew handling) is needed at all: it surfaces the heavy hitters and
how far above the mean key frequency they sit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import register
from ..io import load_table

_TOP_K = 10


@register(
    "stats_key_skew_report",
    oracle=f"""
    WITH freq AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT CAST(SUM(n_events) AS BIGINT) AS total_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM freq
    ),
    ranked AS (
      SELECT user_id, n_events,
             ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id) AS rnk
      FROM freq
    )
    SELECT user_id, n_events, CAST(rnk AS INT) AS rnk,
           total_rows, n_keys,
           CAST(CAST(ROUND(n_events * 1.0 / total_rows, 6)
                AS DECIMAL(10,6)) AS DOUBLE) AS share,
           CAST(CAST(ROUND(n_events * 1.0 * n_keys / total_rows, 4)
                AS DECIMAL(12,4)) AS DOUBLE) AS skew_ratio
    FROM ranked CROSS JOIN tot
    WHERE rnk <= {_TOP_K}
    """,
    survey_ids=["C1", "D3"],
    doc=f"Key-skew diagnostic: top-{_TOP_K} heaviest join keys with "
        "their row share and skew ratio (key frequency / mean "
        "frequency). skew_ratio near 1 everywhere = hash-join safely; "
        "a 100x outlier = pre-salt that key or rely on AQE skew "
        "splitting. Scale shape: one map-side-combined key count, then "
        "TakeOrdered for the top slice (never a global sort of the "
        "frequency table) and a rank window over only those "
        f"{_TOP_K} survivors; the scalar totals broadcast.",
)
def stats_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    freq = e.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n_events"))
    tot = freq.agg(
        F.sum("n_events").cast("bigint").alias("total_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    # asc_nulls_last, not asc: Spark ASC puts NULLs FIRST while the
    # oracle's plain ORDER BY user_id (DuckDB) puts them LAST — a NULL
    # key tying at the top-K boundary would rank differently otherwise
    top = freq.orderBy(F.desc("n_events"), F.asc_nulls_last("user_id")).limit(_TOP_K)
    # rank window runs over the <= _TOP_K surviving rows only
    w = W.orderBy(F.desc("n_events"), F.asc_nulls_last("user_id"))
    share = F.col("n_events") * F.lit(1.0) / F.col("total_rows")
    skew = F.col("n_events") * F.lit(1.0) * F.col("n_keys") / F.col("total_rows")
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "user_id", "n_events", "rnk", "total_rows", "n_keys",
            F.round(share, 6).cast("decimal(10,6)").cast("double").alias("share"),
            F.round(skew, 4).cast("decimal(12,4)").cast("double").alias("skew_ratio"),
        )
    )
