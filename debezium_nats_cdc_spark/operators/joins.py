"""Join operators (SURVEY.md §2.C).

The reference replaces per-event JDBC lookups with enrichment queries
(docs/design.md:659-672); our engine replaces both with joins the planner
can optimize: broadcast hash joins for dimensions, shuffle joins co-
partitioned on the fact key for fact-fact, semi/anti joins for existence.

Scale notes per query are inline; the common rule: dimension sides get an
explicit ``F.broadcast`` hint (they are small by construction — SURVEY
§2.C1: 5 positions / 3 departments; here part/supplier/nation/region),
fact-fact joins shuffle once on the join key and reuse that partitioning
for the downstream aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..io import load_table
from ._common import dec2, money_sum


@register(
    "join_broadcast_enrich",
    oracle="""
    SELECT p_brand, s_name,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY p_brand, s_name
    """,
    survey_ids=["C1", "A10"],
    doc="Stream-static enrichment as broadcast hash joins — the engine's "
        "replacement for the reference's findPositionById JDBC lookups "
        "(docs/design.md:659-672). Both dims broadcast: zero shuffle for "
        "the join; one shuffle for the final agg.",
)
def join_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            money_sum(revenue, scale4=True).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "join_hierarchy_chain",
    oracle="""
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    survey_ids=["C2", "C1"],
    doc="Two-level dimension hierarchy walk (region→nation→customer) — the "
        "departments.parent_department_id analog (sql/init-db.sql:27-35).",
)
def join_hierarchy_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            money_sum(dec2("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "join_self_pairs",
    oracle="""
    SELECT a.n_regionkey AS region_key, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    GROUP BY a.n_regionkey
    """,
    survey_ids=["C2"],
    doc="Self-join on the hierarchy key — manager_id → employees.id shape "
        "(sql/init-db.sql:14-15).",
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load_table(spark, sf_dir, "nation").alias("a")
    b = load_table(spark, sf_dir, "nation").alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .groupBy(F.col("a.n_regionkey").alias("region_key"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "join_semi_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    GROUP BY o_orderpriority
    """,
    survey_ids=["C5", "B5"],
    doc="Scalar-subquery/EXISTS as LEFT SEMI join — the DELETE-WHERE-id-IN "
        "shape from scripts/test-cdc.sh:94-97. Semi join never duplicates "
        "and only ships the key column.",
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "join_anti_orphans",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    survey_ids=["C3"],
    doc="Orphan detection as LEFT ANTI join — the engine's FK-integrity "
        "check (children-before-parent deletes, scripts/test-cdc.sh:90-114).",
)
def join_anti_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_range_interval",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
    survey_ids=["C4"],
    doc="Interval/date-range membership (leave_requests start/end overlap, "
        "sql/init-db.sql:68-69): equi key + range predicate stays a hash "
        "join — never a broadcast-nested-loop (SURVEY §2.C4).",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            money_sum(dec2("l_extendedprice")).cast("double").alias("total_price"),
        )
    )


@register(
    "join_event_correlation",
    oracle="""
    SELECT c.user_id AS user_id, CAST(COUNT(*) AS BIGINT) AS n_correlated
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    GROUP BY c.user_id
    """,
    survey_ids=["C6"],
    doc="causationId-style stream-stream correlation (docs/design.md:238-241) "
        "as a batch self-join: equi on the correlation key + event-time band. "
        "In streaming this is the watermarked interval join (streaming/pipeline).",
)
def join_event_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").alias("c")
    buys = e.filter(F.col("event_type") == "purchase").alias("p")
    return (
        clicks.join(
            buys,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") > F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("c.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_correlated"))
    )


@register(
    "join_top_orders",
    oracle="""
    SELECT o_orderkey, o_orderdate, CAST(revenue AS DOUBLE) AS revenue
    FROM (
      SELECT o_orderkey, o_orderdate,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10)
    """,
    survey_ids=["C1", "D2", "E1"],
    doc="TPC-H Q3-shaped top-N: fact-fact join shuffles on o_orderkey once; "
        "customer filter applied before the join (pushdown); deterministic "
        "tiebreak (o_orderkey) so LIMIT is stable across engines.",
)
def join_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(money_sum(revenue, scale4=True).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .withColumn("revenue", F.col("revenue").cast("double"))
    )


_SALT_FACTOR = 8
# probe rows per key above which the key is salted.  The hot set holds
# <= |probe| / threshold keys, so a threshold sized to the real skew
# (hundreds+ in production) keeps it broadcastable by construction.
_HOT_KEY_THRESHOLD = 16


@register(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    survey_ids=["C1", "C4"],
    doc="Partially-salted large-large join (the production skew-"
        "mitigation pattern): a cheap map-side-combined key count finds "
        "hot probe keys (> threshold rows), that bounded hot set "
        "broadcasts to both sides, and ONLY hot keys take the salted "
        "path — build rows for hot keys replicate SALT_FACTOR ways "
        "(explode of a conditional sequence), probe rows derive "
        "salt = l_linenumber % factor, cold keys join with salt 0 and "
        "zero replication. One scan per side, one shuffle join on "
        "(key, salt); a hot key's rows spread over `factor` reducers "
        "instead of one straggler task, and a skew-free input (like "
        "TPC-H here) pays no replication at all. Result is provably "
        "identical to the unsalted join (the oracle IS the unsalted "
        "join). AQE's skewedJoin solves the same problem at runtime; "
        "the explicit form works where AQE can't see the skew (e.g. "
        "pre-shuffle bucketed inputs) and under any partitioning.",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    hot = (
        l.groupBy("l_orderkey").agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > _HOT_KEY_THRESHOLD)
        .select(F.col("l_orderkey").alias("_hot_key"))
    )
    l2 = (
        l.join(F.broadcast(hot), l.l_orderkey == F.col("_hot_key"), "left")
        .withColumn(
            # pmod+coalesce: a NULL or negative l_linenumber must still
            # land in [0, factor) — a plain % would yield NULL/negative
            # salt and silently drop the row from the inner join,
            # breaking the == unsalted-join guarantee
            "_salt",
            F.when(
                F.col("_hot_key").isNotNull(),
                F.pmod(F.coalesce(F.col("l_linenumber"), F.lit(0)),
                       F.lit(_SALT_FACTOR)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot_key")
    )
    o2 = (
        o.join(F.broadcast(hot), o.o_orderkey == F.col("_hot_key"), "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot_key").isNotNull(),
                    F.sequence(F.lit(0), F.lit(_SALT_FACTOR - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("_hot_key")
    )
    return (
        l2.join(o2, (l2.l_orderkey == o2.o_orderkey) & (l2._salt == o2._salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            money_sum(dec2("l_extendedprice")).alias("total_price"),
        )
        .withColumn("total_price", F.col("total_price").cast("double"))
    )


# ---------------------------------------------------------------------------
# Advisor -> executor wiring (VERDICT r9 #9): one entry point from
# measurement to executed plan.
# ---------------------------------------------------------------------------

def execute_advised_join(left: DataFrame, right: DataFrame, left_key: str,
                         right_key: str | None = None, *,
                         advice: dict | None = None,
                         salt_factor: int = _SALT_FACTOR) -> DataFrame:
    """Execute an inner equi-join the way :func:`stats.advise_join`
    advises — the missing half of the diagnostics->decision loop: the
    advisor measures and decides, this applies the decision.

    Strategies (result is identical to the plain join under all three —
    pytest test_advised_join proves each branch):

      * ``broadcast`` — the advised build side gets an explicit
        ``F.broadcast`` hint; zero shuffle for the join.
      * ``salted`` — the advisor's bounded ``hot_keys`` list is baked
        into the plan as an ``isin`` literal (it is <= max_hot_keys
        values — no broadcast join needed to tag rows).  Left (probe)
        rows on hot keys spread over ``salt_factor`` reducers via a
        deterministic whole-row hash; right (build) rows on hot keys
        replicate ``salt_factor`` ways; cold keys pay nothing.  Same
        construction as join_salted_skew, generalized to any key pair.
      * ``shuffle`` — plain hash join, because the measurements showed
        no reason to do more.

    Salting hardening (ADVICE r10): the spread hash uses only the left
    side's HASHABLE columns — ``xxhash64`` rejects MapType anywhere in
    a column's type tree, so map-bearing columns are skipped rather
    than crashing the plan (defensively, zero hashable columns fall
    back to a ``monotonically_increasing_id()`` spread — unreachable
    for a valid equi-join, whose key column is itself always hashable).
    The salt column name is chosen collision-proof against both sides'
    existing columns.  Known limitation: hot-key rows that are fully
    duplicate in every hashable column hash to ONE salt value and still
    land on a single reducer — the price of a deterministic,
    re-run-stable spread; dedup such a corpus upstream, or spread by
    row id at the call site if assignment determinism doesn't matter.

    Inner-join only: salting replicates build rows, which is only
    transparent when unmatched rows cannot survive into the result.
    Pass ``advice`` to reuse a prior measurement (e.g. a persisted skew
    report) instead of re-scanning both sides.
    """
    right_key = right_key or left_key
    if advice is None:
        from .stats import advise_join

        advice = advise_join(left, right, left_key, right_key)
    strategy = advice.get("strategy", "shuffle")

    if strategy == "broadcast":
        if advice.get("build_side") == "left":
            return F.broadcast(left).join(
                right, left[left_key] == right[right_key], "inner")
        return left.join(F.broadcast(right),
                         left[left_key] == right[right_key], "inner")

    hot = advice.get("hot_keys") or []
    if strategy == "salted" and hot:
        # collision-proof temp column: a user frame may already carry
        # an _eaj_salt (e.g. the output of a previous advised join)
        salt = "_eaj_salt"
        taken = set(left.columns) | set(right.columns)
        while salt in taken:
            salt += "_"
        hashable = [f.name for f in left.schema.fields
                    if _xxhashable(f.dataType)]
        if hashable:
            # whole-hashable-row hash, NULL-safe via pmod: any row lands
            # in [0, factor) deterministically, so re-runs are stable
            spread = F.pmod(F.xxhash64(*[F.col(c) for c in hashable]),
                            F.lit(salt_factor)).cast("int")
        else:
            # every column is map-typed: spread by row id instead —
            # assignment varies with partitioning, result does not
            spread = F.pmod(F.monotonically_increasing_id(),
                            F.lit(salt_factor)).cast("int")
        l2 = left.withColumn(
            salt,
            F.when(F.col(left_key).isin(hot), spread).otherwise(F.lit(0)),
        )
        r2 = right.withColumn(
            salt,
            F.explode(
                F.when(F.col(right_key).isin(hot),
                       F.sequence(F.lit(0), F.lit(salt_factor - 1)))
                .otherwise(F.array(F.lit(0)))
            ),
        )
        joined = l2.join(
            r2,
            (l2[left_key] == r2[right_key]) & (l2[salt] == r2[salt]),
            "inner",
        )
        # restore the plain join's exact column set/order
        return joined.select(*[l2[c] for c in left.columns],
                             *[r2[c] for c in right.columns])

    return left.join(right, left[left_key] == right[right_key], "inner")


def _xxhashable(dt) -> bool:
    """xxhash64 rejects MapType anywhere in a column's type tree (maps
    are unordered, so they have no canonical hash) — recurse through
    arrays and structs to find buried ones."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _xxhashable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_xxhashable(f.dataType) for f in dt.fields)
    return True
