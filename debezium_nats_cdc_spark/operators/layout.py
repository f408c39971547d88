"""Multi-dimensional clustering layout (Z-order / Morton interleave).

The reference clusters its event store on a single (table, ts) sort key
(docs/design.md:185-197 — the audit-trail ordering; our `store.py`
mirrors it).  At 100 TB a SINGLE sort key only helps queries that
filter on its prefix; a lakehouse serving BOTH `WHERE o_custkey = ?`
and `WHERE o_orderdate BETWEEN ...` needs a layout where file-level
min/max statistics are tight on BOTH dimensions at once.  Z-ordering
(bit-interleaving the dimensions into one sort key — the technique
behind Delta/Iceberg `OPTIMIZE ZORDER BY`) is the standard answer:
sorting by the interleaved key bounds every dimension's span within a
file to range/2^(bits_per_dim_in_prefix), so a reader can skip most
files from footer stats alone, for either predicate.

Three pieces, mirroring how a real deployment consumes the technique:

  * ``zorder_key`` / ``Z_SQL`` — the interleave expression itself,
    built once in Python and parsed IDENTICALLY by Spark SQL and DuckDB
    (both engines use two's-complement ``&`` and arithmetic shifts on
    BIGINT — verified, including negative inputs), so the catalog query
    is oracle-checked bit-for-bit.
  * ``layout_zorder_stats`` (catalog) — the planning diagnostic: bucket
    orders by the top Z bits and measure each bucket's per-dimension
    span.  Narrow spans on BOTH dims = the clustering works; this is
    the number a data engineer reads before paying for a rewrite.
  * ``zorder_write`` + ``file_minmax_stats`` — the actual rewrite
    (repartitionByRange on the z-key, sortWithinPartitions, write) and
    the parquet-footer audit proving per-file spans shrank.  Footer
    stats come from pyarrow metadata only — no row is read.

Scale shape: computing the key is a pure projection (no shuffle); the
stats query is one map-side-combined groupBy over <=65536 buckets; the
rewrite is exactly one range shuffle — the same cost as any global
sort, paid once at rest to make every subsequent scan prunable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..io import load_table

# 16 bits per dimension -> 32-bit interleaved key in a BIGINT.  Inputs
# are masked to 16 bits FIRST so shifts only ever see 0..65535 (negative
# keys wrap via two's complement identically in Spark and DuckDB).
BITS_PER_DIM = 16
_MASK = (1 << BITS_PER_DIM) - 1

# top 16 interleaved bits = top 8 bits of EACH dimension -> at most
# 65536 buckets (the agg stays bounded at any corpus size), each
# spanning at most 1/256 of either dimension's 16-bit range
BUCKET_SHIFT = 2 * BITS_PER_DIM - 16


def zbits_for(k: int) -> int:
    """Bits per dimension for a k-dim interleave: 16 while it fits, else
    whatever keeps the full key inside a non-negative BIGINT (k*bits <=
    62).  k=2 -> 16 (the original layout), k=3 -> 16 (48-bit key),
    k=4 -> 15."""
    if k < 2:
        raise ValueError(f"z-order needs >= 2 dimensions, got {k}")
    return min(BITS_PER_DIM, 62 // k)


def z_sql_multi(exprs: list[str], bits: int) -> str:
    """Morton-interleave SQL for k already-masked ``bits``-wide
    expressions.  Dimension j occupies bit positions k*i + j — for k=2
    this is exactly the historical even/odd layout.  Pure +/&/<</>> on
    BIGINT — parses and evaluates identically in Spark SQL and DuckDB,
    which is what lets the oracle check the interleave itself rather
    than a reimplementation of it.
    """
    k = len(exprs)
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            terms.append(f"((({e} >> {i}) & 1) << {k * i + j})")
    return "(" + " + ".join(terms) + ")"


def z_sql(x: str, y: str) -> str:
    """2-dim Morton interleave (x even bits, y odd) — the oracle-shared
    form used by ``layout_zorder_stats``."""
    return z_sql_multi([x, y], BITS_PER_DIM)


# the two clustered dimensions for the catalog query: customer key and
# order day-number (days since 1992-01-01, the TPC-H epoch)
_X = f"(CAST(o_custkey AS BIGINT) & {_MASK})"
_Y_SPARK = f"(CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) & {_MASK})"
_Y_DUCK = ("(CAST(datediff('day', DATE '1992-01-01', "
           f"CAST(o_orderdate AS DATE)) AS BIGINT) & {_MASK})")


def zorder_key(*cols: str) -> F.Column:
    """Interleaved sort key for k BIGINT columns (each masked to
    ``zbits_for(k)`` bits; 16 for the 2- and 3-dim cases)."""
    bits = zbits_for(len(cols))
    mask = (1 << bits) - 1
    return F.expr(z_sql_multi(
        [f"(CAST({c} AS BIGINT) & {mask})" for c in cols], bits))


def _stats_sql(y_expr: str) -> str:
    """Engine-shared body of layout_zorder_stats (y_expr differs only in
    datediff spelling)."""
    z = z_sql("x16", "y16")
    return f"""
    WITH dims AS (
      SELECT {_X} AS x16, {y_expr} AS y16 FROM orders
    ),
    keyed AS (
      SELECT x16, y16, {z} AS zval FROM dims
    ),
    bucketed AS (
      SELECT (zval >> {BUCKET_SHIFT}) AS z_bucket, x16, y16 FROM keyed
    )
    SELECT z_bucket,
           CAST(COUNT(*) AS BIGINT)   AS n_rows,
           MIN(x16)                   AS cust_min,
           MAX(x16)                   AS cust_max,
           MAX(x16) - MIN(x16)        AS cust_span,
           MIN(y16)                   AS day_min,
           MAX(y16)                   AS day_max,
           MAX(y16) - MIN(y16)        AS day_span
    FROM bucketed
    GROUP BY z_bucket
    """


@register(
    "layout_zorder_stats",
    oracle=_stats_sql(_Y_DUCK),
    survey_ids=["E1"],
    doc="Z-order clustering diagnostic: interleave (o_custkey, order "
        "day-number) into a 32-bit Morton key, bucket by its top 16 "
        "bits, and report each bucket's span on BOTH dimensions. "
        "Tight spans (<= 256 of 65536 by construction) on both dims "
        "prove one sort key can serve min/max file skipping for either "
        "predicate — the multi-dim upgrade to the reference's single "
        "(table, ts) cluster order (docs/design.md:185-197). The "
        "interleave expression is literally the same SQL string in the "
        "Spark plan and the DuckDB oracle, so correctness covers the "
        "bit math itself. Scale shape: pure projection + one map-side-"
        "combined groupBy; no join, no window, no "
        "shuffle wider than the bucket count (<= 65536 groups at ANY scale).",
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_stats_sql(_Y_SPARK))


def zorder_write(df: DataFrame, dims: list[str], path: str,
                 n_files: int = 8, drop: list[str] | None = None) -> None:
    """Rewrite ``df`` clustered by the Morton key of ``dims`` (k >= 2
    numeric/timestamp columns; ``drop`` lists caller-side helper columns
    — e.g. string dim encodings — to strip before the write).

    Dimensions are min-max scaled to the full 16-bit space FIRST (the
    same normalization Delta's OPTIMIZE ZORDER applies via range ids):
    raw interleaving of unequal ranges lets the wider dimension own all
    the significant prefix bits and the narrow one degrades to a plain
    sort.  The min/max pass is one cheap agg broadcast back onto the
    rows.

    Then one range shuffle (repartitionByRange balances files even when
    the key distribution is skewed — hash partitioning would not
    preserve z-contiguity) + an in-partition sort, then a plain parquet
    write.  Each output file covers one contiguous z-range, which is
    what bounds BOTH dimensions' footer min/max spans.

    NULL handling: a NULL in ANY dimension scales to bucket 0
    explicitly (coalesce below), so all NULL-keyed rows cluster
    together at the low end of the z-range — deterministic, and footer
    min/max on the non-NULL dimensions still prune them (parquet stats
    ignore NULLs).  They do NOT earn stats-based skipping on their NULL
    dimension; callers with NULL-heavy dims should partition NULLs out
    first (`WHERE dim IS NULL` rows carry no clustering information).

    String dims are rejected loudly: CAST(string AS DOUBLE) is NULL, so
    every row would silently land in bucket 0 and the rewrite would be
    a no-op shuffle.  Encode them order-preservingly first (see
    ``store.optimize_zorder``'s bounded dictionary encode) and pass the
    encoded column here (listing the original via ``drop`` if it should
    not persist twice).
    """
    for c in dims:
        if dict(df.dtypes).get(c) == "string":
            raise TypeError(
                f"zorder_write dim {c!r} is a string column: encode it "
                "order-preservingly first (store.optimize_zorder does "
                "this for bounded vocabularies)")
    bits = zbits_for(len(dims))
    mask = (1 << bits) - 1
    stats = df.agg(*[
        a for i, c in enumerate(dims)
        for a in (F.min(c).cast("double").alias(f"_lo{i}"),
                  F.max(c).cast("double").alias(f"_hi{i}"))
    ])

    def scale(col: str, lo: str, hi: str) -> F.Column:
        rng = F.when(F.col(hi) > F.col(lo),
                     F.col(hi) - F.col(lo)).otherwise(F.lit(1.0))
        scaled = ((F.col(col).cast("double") - F.col(lo))
                  * mask / rng).cast("bigint")
        # NULL dim -> bucket 0 (see docstring: deterministic low-end
        # clustering instead of a NULL z-key landing arbitrarily)
        return F.coalesce(scaled, F.lit(0).cast("bigint"))

    keyed = df.crossJoin(F.broadcast(stats))
    zcols = []
    for i, c in enumerate(dims):
        keyed = keyed.withColumn(f"_zd{i}", scale(c, f"_lo{i}", f"_hi{i}"))
        zcols.append(f"_zd{i}")
    keyed = keyed.withColumn("_z", zorder_key(*zcols))
    helper = (["_z"] + zcols
              + [f"_lo{i}" for i in range(len(dims))]
              + [f"_hi{i}" for i in range(len(dims))]
              + list(drop or []))
    (keyed.repartitionByRange(n_files, "_z")
          .sortWithinPartitions("_z")
          .drop(*helper)
          .write.mode("overwrite").parquet(path))


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` from parquet FOOTERS only (pyarrow
    metadata; zero data pages read) — the same statistics a lakehouse
    reader consults to skip files.  Returns one dict per file:
    ``{"file": ..., "<col>_min": ..., "<col>_max": ...}``.
    """
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rec: dict = {"file": name}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            rec[f"{c}_min"], rec[f"{c}_max"] = lo, hi
        out.append(rec)
    return out


def skipped_fraction(stats: list[dict], col: str, lo, hi) -> float:
    """Fraction of files a ``col BETWEEN lo AND hi`` scan skips on
    footer stats alone (files with no overlap or no stats count as
    skippable only when stats prove disjointness)."""
    if not stats:
        return 0.0
    skipped = sum(
        1 for s in stats
        if s[f"{col}_min"] is not None
        and (s[f"{col}_max"] < lo or s[f"{col}_min"] > hi)
    )
    return skipped / len(stats)
