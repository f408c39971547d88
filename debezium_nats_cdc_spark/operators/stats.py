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


def _profile_branch_sql(col: str, decimal_sum: str) -> str:
    """One UNION ALL branch of the numeric-profile oracle."""
    return f"""
    SELECT '{col}' AS col_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
           CAST(COUNT({col}) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           CAST(MIN({col}) AS DOUBLE) AS min_val,
           CAST(MAX({col}) AS DOUBLE) AS max_val,
           CASE WHEN COUNT({col}) = 0 THEN NULL
                ELSE CAST({decimal_sum} AS DOUBLE) / COUNT({col}) END
             AS mean_val
    FROM orders"""


_PROFILE_COLS = [
    # (column, DuckDB exact-sum expression): integer keys accumulate in
    # DECIMAL(38,0) (DuckDB SUM(BIGINT) is HUGEINT), money in the
    # engine-wide DECIMAL(18,2)->(38,2) money path — the mean is then ONE
    # double division on both engines, never a float summation
    ("o_orderkey", "CAST(SUM(o_orderkey) AS DECIMAL(38,0))"),
    ("o_custkey", "CAST(SUM(o_custkey) AS DECIMAL(38,0))"),
    ("o_totalprice",
     "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))"),
]


@register(
    "stats_numeric_profile",
    oracle="\n    UNION ALL\n".join(
        _profile_branch_sql(c, s) for c, s in _PROFILE_COLS),
    survey_ids=["C1", "D3"],
    doc="Single-pass numeric column profiling (count / nulls / distinct "
        "/ min / max / exact-DECIMAL mean) unpivoted to one row per "
        "column — the data-quality probe a pipeline runs on every new "
        "drop before trusting it.  ONE wide aggregate scans the table "
        "once (every per-column stat is an independent agg expression; "
        "Spark computes them in the same partial-agg pass), then a "
        "driver-free explode unpivots the single wide row.  At 100 TB "
        "this is the same one-scan shape; only COUNT(DISTINCT) adds a "
        "shuffle (expand + two-phase agg), swap for approx_count_distinct "
        "when exactness isn't required.",
)
def stats_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    aggs, structs = [F.count("*").cast("bigint").alias("n_rows")], []
    for col, _ in _PROFILE_COLS:
        sum_dec = (
            F.sum(F.col(col).cast("decimal(18,2)")).cast("decimal(38,2)")
            if col == "o_totalprice"
            else F.sum(col).cast("decimal(38,0)")
        )
        aggs += [
            F.count(col).cast("bigint").alias(f"_{col}_n"),
            F.count_distinct(F.col(col)).cast("bigint").alias(f"_{col}_d"),
            F.min(col).cast("double").alias(f"_{col}_min"),
            F.max(col).cast("double").alias(f"_{col}_max"),
            F.when(F.count(col) == 0, F.lit(None)).otherwise(
                sum_dec.cast("double") / F.count(col)
            ).alias(f"_{col}_mean"),
        ]
        structs.append(F.struct(
            F.lit(col).alias("col_name"),
            F.col("n_rows"),
            F.col(f"_{col}_n").alias("n_nonnull"),
            F.col(f"_{col}_d").alias("n_distinct"),
            F.col(f"_{col}_min").alias("min_val"),
            F.col(f"_{col}_max").alias("max_val"),
            F.col(f"_{col}_mean").alias("mean_val"),
        ))
    return (
        o.agg(*aggs)
        .select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
    )


@register(
    "stats_join_cardinality",
    oracle=f"""
    WITH lf AS (
      SELECT user_id AS join_key, CAST(COUNT(*) AS BIGINT) AS left_rows
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    rf AS (
      SELECT o_custkey AS join_key, CAST(COUNT(*) AS BIGINT) AS right_rows
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
    ),
    keyed AS (
      SELECT lf.join_key, lf.left_rows, rf.right_rows,
             lf.left_rows * rf.right_rows AS pair_rows
      FROM lf JOIN rf USING (join_key)
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(pair_rows), 0) AS BIGINT) AS total_pair_rows
      FROM keyed
    ),
    ranked AS (
      SELECT join_key, left_rows, right_rows, pair_rows,
             ROW_NUMBER() OVER (ORDER BY pair_rows DESC, join_key ASC) AS rnk
      FROM keyed
    )
    SELECT join_key, left_rows, right_rows, pair_rows,
           CAST(rnk AS INT) AS rnk, total_pair_rows,
           CAST(CAST(ROUND(pair_rows * 1.0 / NULLIF(total_pair_rows, 0), 6)
                AS DECIMAL(10,6)) AS DOUBLE) AS share
    FROM ranked CROSS JOIN tot
    WHERE rnk <= {_TOP_K}
    """,
    survey_ids=["C1"],
    doc=f"EXACT pre-join cardinality probe: the output row count of "
        "events JOIN orders ON user_id = o_custkey is, key by key, "
        "left_count * right_count - computed from the two per-key "
        "count aggregates WITHOUT running the join. Reports the "
        f"total and the top-{_TOP_K} contributing keys (the rows "
        "that explode first). This is the planning step before any "
        "expensive N:M join at 100 TB: total >> both inputs means "
        "pre-aggregate or semi-filter first; one dominant key means "
        "join_salted_skew. Scale shape: two map-side-combined key "
        "counts (each FAR smaller than its table), one ids-only "
        "equi-join between them, a 1-row broadcast total, and "
        "TakeOrdered for the top slice - the probe costs a fraction "
        "of the join it prices.",
)
def stats_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    lf = (e.filter(F.col("user_id").isNotNull())
           .groupBy(F.col("user_id").alias("join_key"))
           .agg(F.count("*").cast("bigint").alias("left_rows")))
    rf = (o.filter(F.col("o_custkey").isNotNull())
           .groupBy(F.col("o_custkey").alias("join_key"))
           .agg(F.count("*").cast("bigint").alias("right_rows")))
    keyed = (lf.join(rf, "join_key")
               .withColumn("pair_rows",
                           F.col("left_rows") * F.col("right_rows")))
    tot = keyed.agg(
        F.coalesce(F.sum("pair_rows"), F.lit(0)).cast("bigint")
         .alias("total_pair_rows"))
    top = keyed.orderBy(F.desc("pair_rows"), F.asc("join_key")).limit(_TOP_K)
    w = W.orderBy(F.desc("pair_rows"), F.asc("join_key"))
    share = F.col("pair_rows") * F.lit(1.0) / F.nullif(
        F.col("total_pair_rows"), F.lit(0))
    return (
        top.withColumn("rnk", F.row_number().over(w))
           .crossJoin(F.broadcast(tot))
           .select(
               "join_key", "left_rows", "right_rows", "pair_rows", "rnk",
               "total_pair_rows",
               F.round(share, 6).cast("decimal(10,6)").cast("double")
                .alias("share"),
           )
    )
