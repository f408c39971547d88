"""Z-order layout: interleave math, rewrite locality, footer skipping.

The catalog query's value parity is oracle-checked (strict + driver);
these tests cover what SQL cannot: that ``zorder_write`` actually
produces files whose footer min/max are tight on BOTH dimensions, and
that a range predicate skips most of them from metadata alone.
"""

from __future__ import annotations

import pytest

from debezium_nats_cdc_spark.operators.layout import (
    BITS_PER_DIM,
    file_minmax_stats,
    skipped_fraction,
    z_sql,
    zorder_key,
    zorder_write,
)

SF_DIR = "/root/testdata/sf0.01"


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(BITS_PER_DIM):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
            (65535, 0), (256, 255)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {(r.x, r.y): r.z
           for r in df.withColumn("z", zorder_key("x", "y")).collect()}
    for x, y in rows:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)


def test_zorder_key_three_dims_matches_python_reference(spark):
    from debezium_nats_cdc_spark.operators.layout import zbits_for

    bits = zbits_for(3)
    assert bits * 3 <= 62  # fits a non-negative BIGINT

    def ref(x, y, z):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (3 * i)
            out |= ((y >> i) & 1) << (3 * i + 1)
            out |= ((z >> i) & 1) << (3 * i + 2)
        return out

    rows = [(0, 0, 0), (1, 2, 4), (65535, 65535, 65535),
            (12345, 54321, 4242), (65535, 0, 1)]
    df = spark.createDataFrame(rows, "x bigint, y bigint, z bigint")
    got = {(r.x, r.y, r.z): r.zv for r in
           df.withColumn("zv", zorder_key("x", "y", "z")).collect()}
    mask = (1 << bits) - 1
    for x, y, z in rows:
        assert got[(x, y, z)] == ref(x & mask, y & mask, z & mask), (x, y, z)


def test_zorder_write_rejects_string_dims(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "x bigint, s string")
    with pytest.raises(TypeError, match="string column"):
        zorder_write(df, ["x", "s"], "/tmp/never-written")


def test_zorder_key_masks_negatives_and_overflow(spark):
    # negative and >16-bit inputs must wrap exactly like `& 65535`
    df = spark.createDataFrame([(-1, 70000)], "x bigint, y bigint")
    z = df.withColumn("z", zorder_key("x", "y")).collect()[0].z
    assert z == _morton_ref(-1 & 65535, 70000 & 65535)


def test_z_sql_is_engine_shared():
    duckdb = pytest.importorskip("duckdb")
    expr = z_sql("(CAST(x AS BIGINT) & 65535)", "(CAST(y AS BIGINT) & 65535)")
    got = duckdb.sql(
        f"SELECT {expr} AS z FROM (SELECT 12345 AS x, 54321 AS y)"
    ).fetchone()[0]
    assert got == _morton_ref(12345, 54321)


def test_zorder_write_tightens_both_dims(spark, tmp_path):
    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.io import load_table

    o = (load_table(spark, SF_DIR, "orders")
         .withColumn("day16",
                     F.expr("CAST(datediff(o_orderdate, DATE '1992-01-01')"
                            " AS BIGINT) & 65535"))
         .select("o_custkey", "day16"))

    naive, zpath = str(tmp_path / "naive"), str(tmp_path / "zorder")
    # naive layout: the incoming (unsorted) partitioning, same file count
    # (16 files = a 4-bit z prefix = both dims bounded to 1/4 range)
    o.repartition(16).write.mode("overwrite").parquet(naive)
    zorder_write(o, ["o_custkey", "day16"], zpath, n_files=16)

    def avg_span(path):
        st = file_minmax_stats(path, ["o_custkey", "day16"])
        st = [s for s in st if s["o_custkey_min"] is not None]
        a = sum(s["o_custkey_max"] - s["o_custkey_min"] for s in st) / len(st)
        b = sum(s["day16_max"] - s["day16_min"] for s in st) / len(st)
        return a, b

    cust_naive, day_naive = avg_span(naive)
    cust_z, day_z = avg_span(zpath)
    # a random shuffle puts ~the full range in every file; z-order must
    # shrink the per-file span on BOTH dimensions at once
    assert cust_z < cust_naive / 2, (cust_z, cust_naive)
    assert day_z < day_naive / 2, (day_z, day_naive)


def test_footer_skipping_beats_naive(spark, tmp_path):
    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.io import load_table

    o = (load_table(spark, SF_DIR, "orders")
         .withColumn("day16",
                     F.expr("CAST(datediff(o_orderdate, DATE '1992-01-01')"
                            " AS BIGINT) & 65535"))
         .select("o_custkey", "day16"))
    lo = o.agg(F.min("o_custkey")).collect()[0][0]
    hi = o.agg(F.max("o_custkey")).collect()[0][0]

    naive, zpath = str(tmp_path / "naive"), str(tmp_path / "zorder")
    o.repartition(16).write.mode("overwrite").parquet(naive)
    zorder_write(o, ["o_custkey", "day16"], zpath, n_files=16)

    # a narrow customer-range probe (5% of the key range)
    width = max(1, (hi - lo) // 20)
    probe_lo, probe_hi = lo + (hi - lo) // 2, lo + (hi - lo) // 2 + width
    naive_skip = skipped_fraction(
        file_minmax_stats(naive, ["o_custkey"]), "o_custkey",
        probe_lo, probe_hi)
    z_skip = skipped_fraction(
        file_minmax_stats(zpath, ["o_custkey"]), "o_custkey",
        probe_lo, probe_hi)
    assert naive_skip == 0.0          # every naive file spans ~everything
    # a sizeable fraction of z-files is provably disjoint from footer
    # stats alone (not higher: range boundaries are sample-based and a
    # z-range crossing a high bit spans two cust quadrants)
    assert z_skip >= 0.3, z_skip


def test_zorder_write_is_single_range_shuffle(spark, tmp_path):
    """The rewrite plan: exactly one exchange (the range repartition) —
    no extra hash shuffle, no global sort."""
    from debezium_nats_cdc_spark.io import load_table

    o = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_orderdate")
    keyed = (o.withColumn("_z", zorder_key("o_custkey", "o_custkey"))
              .repartitionByRange(4, "_z")
              .sortWithinPartitions("_z"))
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" in plan.lower(), plan
