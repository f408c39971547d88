"""Pin the r17 sim-family assignment rewrite: the max(struct(cos,
-cell, cell)) AGGREGATE must reproduce the retired row_number window's
pick — ``desc(cos) NULLS LAST, asc(cell_id)``, rn = 1 — on every edge
class (the `test_assign_projection_matches_window_semantics` discipline
applied to the partial-aggregating form that sim_nearest_centroid /
sim_ivf_probe_topk / sim_kmeans_refine now run).

Edge classes: clear winner; exact decimal cosine tie (lowest cell
wins); a NULL-cosine centroid (zero norm) losing to any scored one; an
all-NULL row (zero-norm vector — every cosine NULL) landing in the
LOWEST cell; and the payload (embedding) surviving the aggregate
unchanged.  A struct-ordering change in Spark would silently flip
assignments; this pins the semantics, not just the oracle-checked
end-to-end results.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from debezium_nats_cdc_spark.operators.similarity import (
    _pair_cos,
    _with_norm,
)


def _scored(spark):
    cents = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1.0),
            (2, [1.0, 0.0], 1.0),   # duplicate of cell 1: exact tie
            (3, [0.0, 1.0], 1.0),
            (4, [0.0, 0.0], 0.0),   # zero norm: NULL cosine everywhere
        ],
        "cell_id int, c_emb array<double>, c_norm double")
    vecs = _with_norm(spark.createDataFrame(
        [
            (10, [2.0, 0.0]),    # ties cells 1 and 2 -> lowest (1)
            (11, [0.0, 3.0]),    # clear winner cell 3
            (12, [0.0, 0.0]),    # zero norm: all cosines NULL -> cell 1
        ],
        "vec_id bigint, embedding array<double>"))
    cos = F.round(
        _pair_cos(F.col("c_emb"), F.col("embedding"),
                  F.col("c_norm"), F.col("_norm")), 6
    ).cast("decimal(10,6)")
    return vecs.join(F.broadcast(cents)).select(
        "vec_id", "embedding", "cell_id", cos.alias("cos"))


def _window_pick(scored):
    w = W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", "embedding", "cell_id", "cos"))


def _agg_pick(scored):
    # the exact expression shape the sim queries run (r17)
    return (scored.groupBy("vec_id")
            .agg(F.max(F.struct(
                F.col("cos"),
                (-F.col("cell_id")).alias("_neg"),
                F.col("cell_id").alias("cell_id"),
            )).alias("_b"),
                 F.any_value("embedding").alias("embedding"))
            .select("vec_id", "embedding",
                    F.col("_b.cell_id").alias("cell_id"),
                    F.col("_b.cos").alias("cos")))


def test_agg_argmax_matches_window_semantics(spark):
    scored = _scored(spark)

    def rows(df):
        return sorted(
            (r["vec_id"], tuple(r["embedding"]), r["cell_id"], r["cos"])
            for r in df.collect())

    got_w, got_a = rows(_window_pick(scored)), rows(_agg_pick(scored))
    assert got_w == got_a, (got_w, got_a)
    # and the expected picks on the edge classes, independently of the
    # window reference (so a shared Spark ordering change still fails)
    picks = {r[0]: r[2] for r in got_a}
    assert picks == {10: 1, 11: 3, 12: 1}, picks


def test_agg_argmax_catalog_results_hold(spark):
    """End-to-end guard at sf0.001: the three rewritten catalog queries
    still produce their strict-oracle row counts (full value equality is
    the strict/fuzz harness's job; this keeps the pin inside pytest)."""
    from debezium_nats_cdc_spark.operators.similarity import (
        sim_ivf_probe_topk,
        sim_kmeans_refine,
        sim_nearest_centroid,
    )

    sf = "/root/testdata/sf0.001"
    assert sim_nearest_centroid(spark, sf).count() > 0
    assert sim_ivf_probe_topk(spark, sf).count() > 0
    assert sim_kmeans_refine(spark, sf).count() > 0
