"""NULL/ragged embedding rows must yield SQL NULL from the Arrow vector
kernels — not a stage-killing ValueError (VERDICT r3 task #1).

At 100 TB a single corrupt row must not fail the job: the kernels emit
NULL for invalid rows, the downstream bucket equi-joins drop them (NULL
never equi-matches), and the sim_* results are identical to running on
the clean subset.
"""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
)

from debezium_nats_cdc_spark.functions.vectors import (
    dot_product,
    dot_product_arrow,
    plane_sign_word_arrow,
)

SF_DIR = "/root/testdata/sf0.001"

EMB_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
    StructField("label", IntegerType()),
])

PLANES = [[1.0] + [0.0] * 63, [-1.0] + [0.0] * 63]


def _good(vid, first):
    return (vid, [float(first)] + [0.25] * 63, 0)


def _corrupt_rows():
    """One of each failure mode the guard must absorb."""
    return [
        (9001, None, 0),                       # NULL embedding
        (9002, [1.0, 2.0], 0),                 # ragged (wrong dim)
        (9003, [], 0),                         # empty array
        (9004, [1.0] * 63 + [None], 0),        # NULL element
    ]


def test_plane_sign_word_null_rows_yield_null(spark):
    df = spark.createDataFrame(
        [_good(1, 3.0), _good(2, -3.0)] + _corrupt_rows(), EMB_SCHEMA
    )
    out = {
        r["vec_id"]: r["w"]
        for r in df.select(
            "vec_id", plane_sign_word_arrow("embedding", PLANES).alias("w")
        ).collect()
    }
    # bit0 = sign(first elem dot +e0), bit1 = sign(dot -e0)
    assert out[1] == 0b01 and out[2] == 0b10
    assert all(out[v] is None for v in (9001, 9002, 9003, 9004))


def test_dot_product_arrow_null_rows_yield_null(spark):
    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),    # 32.0
        (2, None, [1.0, 1.0, 1.0]),               # NULL left
        (3, [1.0, 1.0, 1.0], None),               # NULL right
        (4, [1.0, 2.0], [1.0, 2.0, 3.0]),         # dim mismatch a vs b
        (5, [2.0, 2.0, 2.0], [1.0, 1.0, 1.0]),    # 6.0 (valid after invalids)
    ]
    schema = "id long, a array<double>, b array<double>"
    df = spark.createDataFrame(rows, schema)
    out = {r["id"]: r["d"]
           for r in df.select("id", dot_product_arrow("a", "b").alias("d")).collect()}
    assert out[1] == pytest.approx(32.0)
    assert out[2] is None and out[3] is None and out[4] is None
    assert out[5] == pytest.approx(6.0)
    # parity with the Catalyst fold on the valid rows
    jvm = {r["id"]: r["d"]
           for r in df.filter("id in (1, 5)")
                      .select("id", dot_product("a", "b").alias("d")).collect()}
    assert jvm[1] == out[1] and jvm[5] == out[5]


def test_dot_product_arrow_all_valid_fast_path(spark):
    # homogeneous batch exercises the single-vstack fast path
    rows = [(i, [float(i)] * 8, [1.0] * 8) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    out = df.select("id", dot_product_arrow("a", "b").alias("d")).collect()
    assert all(r["d"] == pytest.approx(8.0 * r["id"]) for r in out)


@pytest.fixture(scope="module")
def dirty_sf_dir(tmp_path_factory):
    """sf0.001 embeddings + corrupt rows, staged as a fake sf_dir."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    root = tmp_path_factory.mktemp("dirty_sf")
    clean = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bad = spark.createDataFrame(_corrupt_rows(), EMB_SCHEMA)
    clean.unionByName(bad).coalesce(1).write.parquet(
        str(root / "embeddings.parquet")
    )
    return str(root)


@pytest.mark.parametrize("query", ["sim_lsh_bucketed_neardup",
                                   "sim_embedding_neardup"])
def test_sim_queries_survive_corrupt_embeddings(spark, dirty_sf_dir, query):
    """The two LSH queries that feed unfiltered embeddings to the kernel
    must (a) not crash and (b) return exactly the clean-data result —
    corrupt rows fall out at the NULL-bucket equi-join."""
    from debezium_nats_cdc_spark import catalog

    fn = catalog.queries()[query]
    dirty = sorted(map(tuple, fn(spark, dirty_sf_dir).collect()))
    clean = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert dirty == clean
    assert len(clean) > 0
