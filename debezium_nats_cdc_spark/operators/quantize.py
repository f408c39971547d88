"""Embedding quantization (SURVEY.md §2.K2 — driver-mandate pipeline).

Per-vector symmetric int8 quantization — the storage/ANN compression
step a 100 TB embedding table runs before indexing (4x smaller than
float32, SIMD-friendly dot products at query time).  Pure Catalyst
array lambdas: scale = max|x|/127 (an order-independent max, so
bit-identical across engines with no rounding tricks), q_i =
round(x_i/scale) — by construction |q_i| <= 127, no clamp branch —
and the reconstruction RMSE as the quality metric.

All per-vector: no shuffle at all — this is a map-only projection that
scales embarrassingly (the plan is scan -> project, nothing else).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..io import load_table

_QMAX = 127

_QUANT_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    s AS (
      SELECT vec_id, label, emb,
             list_max(list_transform(emb, x -> abs(x))) / {_QMAX}.0 AS scale
      FROM e
    ),
    q AS (
      SELECT vec_id, label, emb, scale,
             CASE WHEN scale > 0
                  THEN list_transform(emb, x -> CAST(round(x / scale) AS INT))
                  ELSE list_transform(emb, x -> 0) END AS qv
      FROM s
    )
    SELECT vec_id, label,
           CAST(CAST(ROUND(scale, 6) AS DECIMAL(10,6)) AS DOUBLE) AS scale,
           -- NULL-lane guard: list_sum skips the NULL residuals (a
           -- partial rmse) where the engine's fold null-propagates;
           -- scale needs no guard (list_max and F.greatest both skip
           -- NULL lanes identically)
           CAST(CAST(ROUND(
             CASE WHEN len(list_filter(emb, x -> x IS NULL)) = 0 THEN
               sqrt(list_sum([power(emb[i] - qv[i] * scale, 2)
                              for i in range(1, len(emb) + 1)]) / len(emb))
             END,
             6) AS DECIMAL(10,6)) AS DOUBLE) AS rmse,
           CAST(len(list_filter(qv, x -> abs(x) = {_QMAX})) AS INT)
             AS n_saturated
    FROM q
"""


@register(
    "emb_quantize_int8",
    oracle=_QUANT_ORACLE,
    survey_ids=["K2"],
    doc="Symmetric int8 quantization per embedding: scale = max|x|/127 "
        "(order-independent, so cross-engine exact), quantized values "
        "round(x/scale) with |q| <= 127 by construction, reconstruction "
        "RMSE at 6dp as the quality gate, and the saturated-lane count. "
        "Map-only plan — zero shuffles; the compressed form is what a "
        "100 TB ANN index stores and scans.",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    absmax = F.aggregate(
        emb, F.lit(0.0), lambda a, v: F.greatest(a, F.abs(v.cast("double")))
    )
    # internal names are _-prefixed: in the final select the OUTPUT is
    # also called "scale", and Spark's lateral column alias resolution
    # would silently rebind F.col("scale") inside the rmse expression to
    # the 6dp-ROUNDED output, skewing the metric (caught by the oracle)
    # empty vector: absmax's fold init (0.0) is NOT a real max — emit
    # NULL scale like the oracle's list_max([]) (and like a NULL vector)
    d = e.select("vec_id", "label", "embedding",
                 F.when(F.size("embedding") > 0,
                        absmax / F.lit(float(_QMAX))).alias("_scale"))
    q = F.when(
        F.col("_scale") > 0,
        F.transform(emb, lambda x: F.round(x.cast("double") / F.col("_scale"))
                    .cast("int")),
    ).otherwise(F.transform(emb, lambda x: F.lit(0)))
    d = d.withColumn("_qv", q)
    sq = F.aggregate(
        F.zip_with(
            emb, F.col("_qv"),
            lambda x, qv: F.pow(x.cast("double") - qv.cast("double") * F.col("_scale"),
                                F.lit(2.0)),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    rmse = F.sqrt(F.try_divide(sq, F.size(emb)))  # empty vector -> NULL
    return d.select(
        "vec_id", "label",
        F.round("_scale", 6).cast("decimal(10,6)").cast("double").alias("scale"),
        F.round(rmse, 6).cast("decimal(10,6)").cast("double").alias("rmse"),
        F.size(F.filter("_qv", lambda v: F.abs(v) == _QMAX)).cast("int")
        .alias("n_saturated"),
    )


_NORM_ORACLE = """
    WITH n AS (
      SELECT label,
             CASE WHEN embedding IS NOT NULL THEN
               CAST(ROUND(
                 sqrt(coalesce(
                   list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                           x -> x * x)), 0)),
                 4) AS DECIMAL(18,4))
             END AS norm
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(CAST(SUM(norm) AS DECIMAL(38,4)) AS DOUBLE) AS sum_norm,
           CAST(MIN(norm) AS DOUBLE) AS min_norm,
           CAST(MAX(norm) AS DOUBLE) AS max_norm,
           CAST(SUM(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero
    FROM n
    GROUP BY label
"""


@register(
    "emb_norm_stats",
    oracle=_NORM_ORACLE,
    survey_ids=["K2"],
    doc="Embedding-hygiene diagnostics per label: L2-norm distribution "
        "(count, exact DECIMAL sum of 4dp-rounded norms — order-"
        "independent, so cross-engine exact where a double AVG is not — "
        "min/max, zero-vector count). The pre-flight check before "
        "cosine ANN indexing: zero or wildly-scaled norms break cosine "
        "math and flag upstream encoder bugs. Map-side per-vector norm "
        "(no shuffle) + one partial-aggregated groupBy on a low-"
        "cardinality key — the cheapest possible full-table pass at "
        "100 TB.",
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # coalesce(v*v, 0): skip NULL elements the way DuckDB's list_sum
    # does, and make the empty vector a true zero vector on both
    # engines (fold init 0.0 vs list_sum([]) = NULL + coalesce); a
    # NULL *embedding* stays a NULL norm on both sides
    sq = F.aggregate(
        F.col("embedding"), F.lit(0.0),
        lambda a, v: a + F.coalesce(v.cast("double") * v.cast("double"),
                                    F.lit(0.0)),
    )
    norm = F.when(
        F.col("embedding").isNotNull(),
        F.round(F.sqrt(sq), 4).cast("decimal(18,4)"),
    )
    return (
        e.select("label", norm.alias("_norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("_norm").cast("decimal(38,4)").cast("double").alias("sum_norm"),
            F.min("_norm").cast("double").alias("min_norm"),
            F.max("_norm").cast("double").alias("max_norm"),
            F.sum(F.when(F.col("_norm") == 0, 1).otherwise(0)).cast("bigint")
            .alias("n_zero"),
        )
    )


_DIM_ORACLE = """
    WITH flat AS (
      SELECT unnest(range(0, len(embedding))) AS pos,
             unnest(list_transform(CAST(embedding AS DOUBLE[]),
                                   x -> CAST(ROUND(x, 6) AS DECIMAL(14,6))))
               AS x
      FROM embeddings
      WHERE embedding IS NOT NULL
    )
    SELECT CAST(pos AS INT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n_vals,
           CAST(CAST(SUM(x) AS DECIMAL(38,6)) AS DOUBLE) AS sum_x,
           CAST(MIN(x) AS DOUBLE) AS min_x,
           CAST(MAX(x) AS DOUBLE) AS max_x
    FROM flat
    GROUP BY pos
"""


@register(
    "emb_dim_stats",
    oracle=_DIM_ORACLE,
    survey_ids=["K2"],
    doc="Per-dimension embedding statistics (count, DECIMAL-exact sum "
        "of 6dp-rounded values, min, max) — the input to mean-centering "
        "/ whitening before quantization or PCA, and the fastest way "
        "to spot a dead or exploding encoder dimension. posexplode "
        "keeps vector order; the groupBy key is the dimension index "
        "(bounded, = vector width), so the aggregation is map-side "
        "partial everywhere and the shuffle carries one row per "
        "(partition, dim). DECIMAL sums keep the result order-"
        "independent — cross-engine exact where double sums are not.",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    x = F.round(F.col("x").cast("double"), 6).cast("decimal(14,6)")
    return (
        e.filter(F.col("embedding").isNotNull())
        .select(F.posexplode("embedding").alias("pos", "x"))
        .select("pos", x.alias("_x"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n_vals"),
            F.sum("_x").cast("decimal(38,6)").cast("double").alias("sum_x"),
            F.min("_x").cast("double").alias("min_x"),
            F.max("_x").cast("double").alias("max_x"),
        )
    )
