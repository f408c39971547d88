"""execute_advised_join: the advisor's three strategies each produce a
result identical to the plain inner join (broadcast / salted / shuffle),
the advisor-driven end-to-end path picks the right branch from
measurements, and the broadcast hint actually lands in the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.operators.joins import execute_advised_join
from debezium_nats_cdc_spark.operators.stats import advise_join


def _facts(spark, n=2000, hot_key=7, hot_n=600):
    """Skewed fact table: key `hot_key` carries `hot_n` rows."""
    base = spark.range(n).select(
        (F.col("id") % 50).cast("bigint").alias("k"),
        F.col("id").alias("payload"))
    hot = spark.range(hot_n).select(
        F.lit(hot_key).cast("bigint").alias("k"),
        (F.col("id") + 1_000_000).alias("payload"))
    return base.unionByName(hot)


def _dim(spark, n=50):
    return spark.range(n).select(
        F.col("id").cast("bigint").alias("dk"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _plain(left, right, lk, rk):
    return left.join(right, left[lk] == right[rk], "inner")


def test_broadcast_branch_equals_plain_and_hints(spark):
    left, right = _facts(spark), _dim(spark)
    advice = advise_join(left, right, "k", "dk")
    assert advice["strategy"] == "broadcast"
    assert advice["build_side"] == "right"
    out = execute_advised_join(left, right, "k", "dk", advice=advice)
    assert _rows(out) == _rows(_plain(left, right, "k", "dk"))
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_broadcast_build_side_left(spark):
    left, right = _dim(spark), _facts(spark)
    advice = advise_join(left, right, "dk", "k")
    assert advice["strategy"] == "broadcast" and advice["build_side"] == "left"
    out = execute_advised_join(left, right, "dk", "k", advice=advice)
    assert _rows(out) == _rows(_plain(left, right, "dk", "k"))


def test_salted_branch_equals_plain(spark):
    left = _facts(spark)
    right = _facts(spark, n=500, hot_key=7, hot_n=300).select(
        F.col("k").alias("rk"), F.col("payload").alias("rpayload"))
    # force past the broadcast gate so the measured skew drives the call
    advice = advise_join(left, right, "k", "rk", broadcast_rows=10)
    assert advice["strategy"] == "salted"
    assert 7 in advice["hot_keys"]
    out = execute_advised_join(left, right, "k", "rk", advice=advice)
    plain = _plain(left, right, "k", "rk")
    assert out.columns == plain.columns
    assert _rows(out) == _rows(_plain(left, right, "k", "rk"))


def test_salted_handles_null_keys_and_empty_sides(spark):
    left = _facts(spark).unionByName(
        spark.sql("SELECT CAST(NULL AS BIGINT) k, CAST(-1 AS BIGINT) payload"))
    right = _facts(spark, n=300, hot_n=200).select(
        F.col("k").alias("rk"), F.col("payload").alias("rpayload"))
    advice = {"strategy": "salted", "build_side": None, "hot_keys": [7],
              "rationale": {}}
    out = execute_advised_join(left, right, "k", "rk", advice=advice)
    assert _rows(out) == _rows(_plain(left, right, "k", "rk"))
    empty = right.filter(F.lit(False))
    out2 = execute_advised_join(left, empty, "k", "rk", advice=advice)
    assert out2.count() == 0


def test_shuffle_branch_equals_plain(spark):
    left = spark.range(3000).select(
        (F.col("id") % 997).cast("bigint").alias("k"),
        F.col("id").alias("payload"))
    right = spark.range(2000).select(
        (F.col("id") % 997).cast("bigint").alias("rk"),
        (F.col("id") * 2).alias("rpayload"))
    advice = advise_join(left, right, "k", "rk", broadcast_rows=10)
    assert advice["strategy"] == "shuffle"
    out = execute_advised_join(left, right, "k", "rk", advice=advice)
    assert _rows(out) == _rows(_plain(left, right, "k", "rk"))


def test_end_to_end_measures_when_no_advice_given(spark):
    left, right = _facts(spark), _dim(spark)
    out = execute_advised_join(left, right, "k", "dk")
    assert _rows(out) == _rows(_plain(left, right, "k", "dk"))


def test_salted_skips_map_columns_in_spread_hash(spark):
    """ADVICE r10: xxhash64 rejects MapType — a map-bearing left frame
    must not crash the salted plan; the spread hashes the other columns."""
    left = _facts(spark).withColumn(
        "attrs", F.create_map(F.lit("k"), F.col("payload")))
    right = _facts(spark, n=300, hot_n=200).select(
        F.col("k").alias("rk"), F.col("payload").alias("rpayload"))
    advice = {"strategy": "salted", "hot_keys": [7], "rationale": {}}
    out = execute_advised_join(left, right, "k", "rk", advice=advice)
    plain = _plain(left, right, "k", "rk")
    assert out.columns == plain.columns
    # maps aren't comparable: compare on the hashable projection + map
    # rendered as sorted items
    def norm(df):
        return sorted(map(tuple, df.select(
            "k", "payload", F.map_keys("attrs")[0], F.map_values("attrs")[0],
            "rk", "rpayload").collect()))
    assert norm(out) == norm(plain)


def test_xxhashable_type_walk_and_map_payload_join(spark):
    """The hashability walk finds maps buried in arrays/structs (an
    equi-join key can never itself be a map, so the all-map fallback is
    exercised through the helper), and a map-payload salted join still
    matches plain."""
    from debezium_nats_cdc_spark.operators.joins import _xxhashable
    from pyspark.sql.types import (ArrayType, LongType, MapType,
                                   StringType, StructField, StructType)

    assert not _xxhashable(MapType(StringType(), LongType()))
    assert not _xxhashable(ArrayType(MapType(StringType(), LongType())))
    assert not _xxhashable(StructType(
        [StructField("m", MapType(StringType(), LongType()))]))
    assert _xxhashable(ArrayType(LongType()))
    assert _xxhashable(StructType([StructField("s", StringType())]))

    left = _facts(spark).select(
        "k", F.create_map(F.lit("p"), F.col("payload")).alias("mp"))
    right = _facts(spark, n=300, hot_n=200).select(
        F.col("k").alias("rk"), F.col("payload").alias("rpayload"))
    advice = {"strategy": "salted", "hot_keys": [7], "rationale": {}}
    out = execute_advised_join(left, right, "k", "rk", advice=advice)
    got = sorted(map(tuple, out.select(
        "k", F.map_values("mp")[0], "rk", "rpayload").collect()))
    want = sorted(map(tuple, _plain(left, right, "k", "rk").select(
        "k", F.map_values("mp")[0], "rk", "rpayload").collect()))
    assert got == want


def test_salted_survives_preexisting_salt_column(spark):
    """ADVICE r10: a left OR right frame that already carries _eaj_salt
    (e.g. the output of a previous advised join) must not collide with
    the temp column."""
    left = _facts(spark).withColumn("_eaj_salt", F.lit(99))
    right = _facts(spark, n=300, hot_n=200).select(
        F.col("k").alias("rk"), F.col("payload").alias("rpayload")) \
        .withColumn("_eaj_salt_", F.lit(-1))
    advice = {"strategy": "salted", "hot_keys": [7], "rationale": {}}
    out = execute_advised_join(left, right, "k", "rk", advice=advice)
    plain = _plain(left, right, "k", "rk")
    assert out.columns == plain.columns
    assert _rows(out) == _rows(plain)
    # the user's column came through untouched
    assert out.select("_eaj_salt").distinct().collect()[0][0] == 99
