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


# --- join-strategy advisor thresholds (shared by the catalog query's
# Spark plan + DuckDB oracle via the f-string SQL body, and by
# advise_join()'s defaults) -------------------------------------------
#
# ADVISOR_BROADCAST_ROWS: broadcast the smaller side when it fits the
# usual 10 MB autoBroadcastJoinThreshold envelope.  Rows, not bytes,
# because the probe only counts rows; 25k rows x ~400 B/row ≈ 10 MB.
# At 100 TB the caller overrides with (threshold_bytes / avg_row_bytes).
# ADVISOR_SKEW_RATIO: hottest-key frequency / mean key frequency above
# which a plain hash join stragglers on one reducer; 8.0 matches the
# point where AQE's skewedPartitionFactor (default 5) would already
# have split the partition — below it, salting costs more than the
# straggler.
ADVISOR_BROADCAST_ROWS = 25_000
ADVISOR_SKEW_RATIO = 8.0


_ADVISOR_SQL = f"""
    WITH lf AS (
      SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    rf AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
    ),
    ls AS (
      SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_n
      FROM lf
    ),
    rs AS (
      SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_n
      FROM rf
    ),
    skews AS (
      SELECT ls.total AS left_rows, ls.n_keys AS left_keys,
             ls.max_n AS left_max_key_rows,
             CAST(ROUND(ls.max_n * 1.0 * ls.n_keys / NULLIF(ls.total, 0), 4)
                  AS DECIMAL(12,4)) AS lskew,
             rs.total AS right_rows, rs.n_keys AS right_keys,
             rs.max_n AS right_max_key_rows,
             CAST(ROUND(rs.max_n * 1.0 * rs.n_keys / NULLIF(rs.total, 0), 4)
                  AS DECIMAL(12,4)) AS rskew
      FROM ls CROSS JOIN rs
    ),
    pair AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS matched_keys,
             CAST(COALESCE(SUM(lf.n * rf.n), 0) AS BIGINT) AS total_pair_rows
      FROM lf JOIN rf USING (k)
    )
    SELECT left_rows, left_keys, left_max_key_rows,
           CAST(lskew AS DOUBLE) AS left_skew_ratio,
           right_rows, right_keys, right_max_key_rows,
           CAST(rskew AS DOUBLE) AS right_skew_ratio,
           matched_keys, total_pair_rows,
           CASE
             WHEN LEAST(left_rows, right_rows) <= {ADVISOR_BROADCAST_ROWS}
               THEN 'broadcast'
             WHEN GREATEST(COALESCE(lskew, CAST(0 AS DECIMAL(12,4))),
                           COALESCE(rskew, CAST(0 AS DECIMAL(12,4))))
                  >= {ADVISOR_SKEW_RATIO}
               THEN 'salted'
             ELSE 'shuffle'
           END AS strategy,
           CASE
             WHEN LEAST(left_rows, right_rows) > {ADVISOR_BROADCAST_ROWS}
               THEN NULL
             WHEN left_rows <= right_rows THEN 'left'
             ELSE 'right'
           END AS build_side
    FROM skews CROSS JOIN pair
"""


@register(
    "stats_join_advisor",
    oracle=_ADVISOR_SQL,
    survey_ids=["C1"],
    doc="Join-strategy advisor as a query: measures both sides of "
        "events JOIN orders ON user_id = o_custkey (totals, key "
        "counts, hottest-key frequency, skew ratio, exact output "
        "cardinality) and emits the decision — broadcast below "
        f"{ADVISOR_BROADCAST_ROWS} rows on the smaller side, salted "
        f"above a {ADVISOR_SKEW_RATIO}x max/mean skew ratio, plain "
        "shuffle otherwise — with every measured input in the row, so "
        "the advice is auditable. The SQL body is shared VERBATIM with "
        "the DuckDB oracle (the layout.py pattern), so the decision "
        "logic itself is oracle-checked. Scale shape: two map-side-"
        "combined key counts, one ids-only equi-join, three 1-row "
        "scalar frames cross-joined (broadcast, bounded); the probe "
        "costs a fraction of the join it prices. advise_join() is the "
        "library form that additionally returns the hot-key list for "
        "join_salted_skew-style partial salting.",
)
def stats_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ADVISOR_SQL)


def advise_join(left: DataFrame, right: DataFrame, left_key: str,
                right_key: str | None = None, *,
                broadcast_rows: int = ADVISOR_BROADCAST_ROWS,
                skew_ratio: float = ADVISOR_SKEW_RATIO,
                max_hot_keys: int = 16) -> dict:
    """Measure both join sides and pick a strategy: the planning step
    SURVEY §4 promises before any 100 TB join.

    Consumes the same measurements as `stats_key_skew_report` and
    `stats_join_cardinality` and closes the loop to a decision:

      * ``broadcast`` — the smaller side is under ``broadcast_rows``
        (skew is irrelevant: a broadcast join never shuffles the key);
        ``build_side`` names it.
      * ``salted(hot_keys)`` — some key's frequency exceeds
        ``skew_ratio`` x the mean key frequency on either side; the
        returned ``hot_keys`` (merged across both skewed sides by max
        frequency, hottest first, bounded at ``max_hot_keys``) feed a
        join_salted_skew-style partial salting, or AQE skew-join
        handles it at runtime.
      * ``shuffle`` — plain hash join; no measured reason to do more.

    Cost: one filter+aggregate per side (map-side combined key counts
    reduced to a 1-row summary) plus, only when salting is advised, a
    bounded ``limit(max_hot_keys)`` collect of the hot keys.  Nothing
    unbounded reaches the driver.  At 100 TB run it on a sample or
    reuse persisted skew-report output; the thresholds are the
    documented module constants.

    Returns ``{"strategy", "build_side", "hot_keys", "rationale"}``
    where rationale carries every measured number the decision used.
    """
    right_key = right_key or left_key

    def _freq(df: DataFrame, key: str) -> DataFrame:
        return (df.filter(F.col(key).isNotNull())
                  .groupBy(F.col(key).alias("_k"))
                  .agg(F.count("*").cast("bigint").alias("_n")))

    def _summary(freq: DataFrame) -> dict:
        row = freq.agg(
            F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("total"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.coalesce(F.max("_n"), F.lit(0)).cast("bigint").alias("max_n"),
        ).first()
        skew = (row.max_n * row.n_keys / row.total) if row.total else None
        return {"total": row.total, "n_keys": row.n_keys,
                "max_n": row.max_n, "skew_ratio": skew}

    lfreq, rfreq = _freq(left, left_key), _freq(right, right_key)
    lsum, rsum = _summary(lfreq), _summary(rfreq)
    rationale = {"left": lsum, "right": rsum,
                 "broadcast_rows": broadcast_rows,
                 "skew_ratio_threshold": skew_ratio}

    if min(lsum["total"], rsum["total"]) <= broadcast_rows:
        side = "left" if lsum["total"] <= rsum["total"] else "right"
        return {"strategy": "broadcast", "build_side": side,
                "hot_keys": [], "rationale": rationale}

    def _hot(freq: DataFrame, summary: dict) -> list[tuple]:
        mean = summary["total"] / summary["n_keys"]
        return [(r._k, r._n) for r in (
            freq.filter(F.col("_n") >= F.lit(skew_ratio * mean))
                .orderBy(F.desc("_n"), F.asc("_k"))
                .limit(max_hot_keys).collect())]

    skews = [s["skew_ratio"] or 0.0 for s in (lsum, rsum)]
    if max(skews) >= skew_ratio:
        # merge both sides' candidates by MAX frequency, then keep the
        # documented contract: hottest first, bounded at max_hot_keys —
        # a caller salting hot_keys[:k] must get the heaviest keys, not
        # the lexicographically smallest
        best: dict = {}
        for k, n in ((_hot(lfreq, lsum) if skews[0] >= skew_ratio else [])
                     + (_hot(rfreq, rsum) if skews[1] >= skew_ratio else [])):
            if n > best.get(k, -1):
                best[k] = n
        hot = [k for k, _ in sorted(best.items(),
                                    key=lambda kv: (-kv[1], kv[0]))
               ][:max_hot_keys]
        return {"strategy": "salted", "build_side": None,
                "hot_keys": hot, "rationale": rationale}

    return {"strategy": "shuffle", "build_side": None,
            "hot_keys": [], "rationale": rationale}


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
    doc="Numeric column profiling (count / nulls / distinct / min / max "
        "/ exact-DECIMAL mean) unpivoted to one row per column — the "
        "data-quality probe a pipeline runs on every new drop before "
        "trusting it.  The plain stats ride ONE wide aggregate over one "
        "scan; each exact COUNT(DISTINCT) runs as its OWN two-level "
        "aggregate over a single-column pruned scan and crossJoins its "
        "1-row result back (scalar-bounded broadcast).  Mixing the "
        "distincts into the wide aggregate planned an Expand that "
        "re-sent every row once per distinct column through a "
        "full-width ~4x-cardinality hash aggregate — measured 1.7x "
        "slower at sf0.1 and strictly more bytes at any scale (r17); "
        "the split form shuffles only per-column distinct keys, "
        "map-side partially aggregated.  Swap for approx_count_distinct "
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
    wide = o.agg(*aggs)
    for col, _ in _PROFILE_COLS:
        # each exact distinct count is its own narrow two-level agg
        # (no Expand); the 1-row result broadcast-crossJoins back onto
        # the wide stats row — COUNT(DISTINCT) semantics are identical
        # (NULLs excluded by both forms)
        d = o.agg(
            F.count_distinct(F.col(col)).cast("bigint").alias(f"_{col}_d"))
        wide = wide.join(F.broadcast(d))
    return (
        wide.select(F.explode(F.array(*structs)).alias("p"))
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
