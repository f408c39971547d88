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
        "explode is a pure map; the self-join shuffles 2*n*d rows "
        "hashed on vec_id (each key holds exactly its own d rows — no "
        "skew by construction); the aggregate is map-side partial with "
        "at most d*(d+1)/2 groups at ANY corpus size, so the final "
        "shuffle carries d^2 cells per partition, not data.",
)
def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("embedding").isNotNull())
         .select("vec_id", "embedding"))
    e = v.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "_raw"),
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("_raw").cast("double"), 6)
         .cast("decimal(14,6)").alias("x"),
    ).filter(F.col("x").isNotNull())
    # ^ NULL elements dropped BEFORE pairing: a pair row with a NULL
    # element would inflate n_pairs (COUNT(*)) while contributing
    # nothing to the sums, biasing cov's denominator — each cell must
    # see exactly the rows its sums see
    a = e.select(F.col("vec_id"), F.col("pos").alias("dim_i"),
                 F.col("x").alias("xa"))
    b = e.select(F.col("vec_id"), F.col("pos").alias("dim_j"),
                 F.col("x").alias("xb"))
    pairs = (
        a.join(b, ["vec_id"])
         .filter(F.col("dim_j") >= F.col("dim_i"))
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
