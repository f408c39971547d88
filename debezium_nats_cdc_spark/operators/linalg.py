"""Distributed linear-algebra primitives over the embedding corpus
(SURVEY §2.K2 adjacent — the statistics PCA/whitening consumes).

The reference stores no vectors at all; the driver-mandated embedding
pipeline (quantize, dedup, ANN) repeatedly needs the corpus' second-
moment structure: mean-centering uses per-dim means (`emb_dim_stats`),
whitening/PCA and Mahalanobis-style outlier gates need the full
COVARIANCE matrix.  At 100 TB computing it is a textbook one-pass
distributed reduction — this module expresses it so Catalyst keeps the
aggregation map-side partial and the shuffle bounded by d^2 cells, not
the corpus.

Cross-engine exactness: every element is canonicalized to the engine-
wide 6dp DECIMAL(14,6) first (the `emb_dim_stats` convention), so the
pairwise products are DECIMAL(28,12) and their sums are EXACT —
summation order cannot differ between Spark and DuckDB.  Only the
final covariance formula ((Sxy - Sx*Sy/n) / (n-1)) runs in double, on
identical inputs with an identical expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..io import load_table


@register(
    "emb_covariance",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
    ),
    e AS (
      SELECT vec_id, pos, x FROM (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE), 6)
                    AS DECIMAL(14,6)) AS x
        FROM v
      ) WHERE x IS NOT NULL
    ),
    pairs AS (
      SELECT a.pos AS dim_i, b.pos AS dim_j,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             SUM(a.x) AS sx, SUM(b.x) AS sy,
             SUM(a.x * b.x) AS sxy
      FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.pos >= a.pos
      GROUP BY a.pos, b.pos
    )
    SELECT dim_i, dim_j, n_pairs,
           CAST(CAST(ROUND(
             (CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n_pairs)
             / (n_pairs - 1), 8) AS DECIMAL(18,8)) AS DOUBLE) AS cov
    FROM pairs
    WHERE n_pairs > 1
    """,
    survey_ids=["K2"],
    doc="Exact sample covariance matrix of the embedding corpus (upper "
        "triangle, one row per dim pair) — the input to whitening/PCA "
        "before quantization or ANN indexing, and the dense-dimension "
        "correlation probe that catches redundant encoder dims. "
        "Elements canonicalize to 6dp DECIMAL first, so all sums are "
        "EXACT (order-independent) DECIMAL accumulation; only the final "
        "(Sxy - Sx*Sy/n)/(n-1) runs in double, on identical inputs in "
        "both engines, rounded to the 8dp hash-compared value. Ragged/"
        "short vectors contribute only the dim pairs they have, and "
        "NULL elements drop before pairing so each cell's n_pairs "
        "counts exactly the rows its sums saw (per-cell n_pairs; "
        "cells with n<=1 dropped). Scale shape: the "
        "pair generation is a PURE PROJECTION (nested F.transform over "
        "the array builds the upper-triangle element pairs per row — no "
        "explode-then-self-join, so NO data shuffle at all); the "
        "aggregate is map-side partial with at most d*(d+1)/2 groups at "
        "ANY corpus size, so the only shuffle carries d^2 cells per "
        "partition, not data.",
)
def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    v = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("embedding").isNotNull())
         .select("embedding")
         # The pair projection below does d^2 work per row; a corpus that
         # arrives in few splits (locally: ONE parquet file) would run it
         # in few tasks.  Round-robin the raw vectors (n rows, the
         # cheapest possible exchange — d values/row, not the d^2 pairs)
         # so the heavy projection parallelizes; on a real cluster with
         # many input splits this is still wanted for even task sizing.
         .repartition(sess_parts))
    # Canonicalize every element to the engine-wide 6dp DECIMAL once.
    xs = F.transform(
        "embedding",
        lambda c: F.round(c.cast("double"), 6).cast("decimal(14,6)"),
    )
    # Upper-triangle pairs per row, built JVM-side as a projection:
    # d^2 structs filtered to the j>=i half with both elements non-NULL.
    # NULL elements drop BEFORE pairing: a pair row with a NULL element
    # would inflate n_pairs (COUNT(*)) while contributing nothing to
    # the sums, biasing cov's denominator — each cell must see exactly
    # the rows its sums see.  Ragged vectors contribute only the dim
    # pairs they have (the nested transform ranges over the actual
    # array length row by row).
    pair_arr = F.filter(
        F.flatten(F.transform(
            xs,
            lambda xa, i: F.transform(
                xs,
                lambda xb, j: F.struct(
                    i.cast("int").alias("dim_i"),
                    j.cast("int").alias("dim_j"),
                    xa.alias("xa"),
                    xb.alias("xb"),
                ),
            ),
        )),
        lambda p: (p["dim_j"] >= p["dim_i"])
                  & p["xa"].isNotNull() & p["xb"].isNotNull(),
    )
    pairs = (
        v.select(F.explode(pair_arr).alias("p"))
         .select("p.dim_i", "p.dim_j", "p.xa", "p.xb")
         .groupBy("dim_i", "dim_j")
         .agg(
             F.count("*").cast("bigint").alias("n_pairs"),
             F.sum("xa").alias("sx"),
             F.sum("xb").alias("sy"),
             F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
         )
         .filter(F.col("n_pairs") > 1)
    )
    cov = (
        (F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double")
           / F.col("n_pairs"))
        / (F.col("n_pairs") - 1)
    )
    return pairs.select(
        "dim_i", "dim_j", "n_pairs",
        F.round(cov, 8).cast("decimal(18,8)").cast("double").alias("cov"),
    )
