"""Similarity search over embeddings (SURVEY.md §2.K2 — driver mandate).

Brute-force cosine top-k as the correctness baseline; LSH-bucketed
(random-hyperplane) variant as the 100 TB scale path.  The vector math is
pure Catalyst (functions/vectors.py): zip_with/aggregate fold JVM-side,
so there's no Python or serialization in the inner loop.

Determinism for oracle parity: cosine is computed as a left fold in
double (fixed association order) and ROUNDED to 6dp DECIMAL before any
top-k/threshold decision, with vec_id tiebreaks — identical row sets on
any engine or partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import register
from ..functions.vectors import (
    cosine_similarity,
    dot_product,
    dot_product_arrow,
    l2_norm,
)
from ..io import load_table


def _with_norm(df, emb_col: str = "embedding"):
    """Precompute the L2 norm once per row — pair-wise cosine then costs
    one dot product instead of a dot plus two norms (3× less math in the
    candidate loop; identical doubles: same ops in the same order)."""
    return df.withColumn("_norm", l2_norm(F.col(emb_col)))


def _pair_cos(a_emb, b_emb, a_norm, b_norm):
    return dot_product(a_emb, b_emb) / (a_norm * b_norm)


def _pair_cos_arrow(a_emb, b_emb, a_norm, b_norm):
    """Arrow-batched pair cosine for candidate-VERIFICATION stages, where
    pair count ≫ row count (see dot_product_arrow).  Norms stay JVM-side:
    computed once per row before the join, not per pair."""
    return dot_product_arrow(a_emb, b_emb) / (a_norm * b_norm)

_ORACLE_COS = """
    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
"""


@register(
    "sim_cosine_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, CAST(cos_sim AS DOUBLE) AS cos_sim,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(ROUND({_ORACLE_COS}, 6) AS DECIMAL(10,6)) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY CAST(ROUND({_ORACLE_COS}, 6) AS DECIMAL(10,6)) DESC, b.vec_id) AS rnk
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 8)
    WHERE rnk <= 5
    """,
    survey_ids=["K2"],
    doc="Brute-force cosine top-k: tiny query set broadcast against the "
        "full corpus — the exact baseline every ANN variant is graded "
        "against. One scan of the corpus, no shuffle until the per-query "
        "top-k (k rows per query).",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cos = F.round(cosine_similarity("q_emb", "embedding"), 6).cast("decimal(10,6)")
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .withColumn("rnk", F.col("rnk").cast("int"))
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
    )


@register(
    "sim_nearest_centroid",
    oracle=f"""
    SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(CAST(ROUND(AVG(cos_sim), 6) AS DECIMAL(10,6)) AS DOUBLE) AS avg_cos
    FROM (
      SELECT b.vec_id, a.vec_id AS centroid_id,
             CAST(ROUND({_ORACLE_COS}, 6) AS DECIMAL(10,6)) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY b.vec_id
               ORDER BY CAST(ROUND({_ORACLE_COS}, 6) AS DECIMAL(10,6)) DESC, a.vec_id) AS rnk
      FROM embeddings a JOIN embeddings b ON true
      WHERE a.vec_id < 8)
    WHERE rnk = 1
    GROUP BY centroid_id
    """,
    survey_ids=["K2"],
    doc="IVF assignment step: route each vector to its nearest of C "
        "broadcast centroids (the coarse quantizer of an IVF index). At "
        "scale this is the partitioning pass that makes probe-time search "
        "touch 1/C of the corpus.",
)
def sim_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    cos = F.round(cosine_similarity("c_emb", "embedding"), 6).cast("decimal(10,6)")
    scored = e.join(F.broadcast(cents)).select(
        "vec_id", "centroid_id", cos.alias("cos_sim")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    assigned = scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") == 1)
    return assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("cos_sim"), 6).cast("decimal(10,6)").cast("double").alias("avg_cos"),
    )


@register(
    "sim_embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(CAST(ROUND({_ORACLE_COS}, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND({_ORACLE_COS}, 6) >= 0.35
    """,
    survey_ids=["K1", "K2"],
    doc="Embedding-cosine near-duplicate pairs, label-blocked: candidate "
        "pairs only form within a blocking key (here the cluster label — "
        "at scale, an LSH bucket), never a full cross join.",
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _with_norm(load_table(spark, sf_dir, "embeddings"))
    a = e.alias("a")
    b = e.alias("b")
    cos = F.round(
        _pair_cos_arrow(F.col("a.embedding"), F.col("b.embedding"),
                        F.col("a._norm"), F.col("b._norm")), 6
    ).cast("decimal(10,6)")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.35)
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
    )


@register(
    "sim_ivf_probe_topk",
    oracle=None,  # two-stage quantized search: rows-only check
    survey_ids=["K2"],
    doc="IVF probe-time search: assign corpus to C=16 coarse centroids "
        "(one broadcast pass), then for each query scan only its nprobe=4 "
        "nearest cells — a bucket equi-join on cell id touching ~nprobe/C "
        "of the corpus instead of all of it. The partition-pruned ANN "
        "layout for 100 TB: cells map to partitions of a bucketed table.",
)
def sim_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_cells, nprobe, k = 16, 4, 5
    e = _with_norm(load_table(spark, sf_dir, "embeddings"))
    cents = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("c_emb"),
        F.col("_norm").alias("c_norm"),
    )
    cell_cos = _pair_cos(F.col("c_emb"), F.col("embedding"), F.col("c_norm"), F.col("_norm"))
    # index build: nearest centroid per vector (IVF assignment)
    w_assign = W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell_id"))
    indexed = (
        e.join(F.broadcast(cents))
        .select("vec_id", "embedding", "_norm", "cell_id", cell_cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "_norm", "cell_id")
    )
    # probe: nprobe nearest cells per query
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
    )
    probe_cos = _pair_cos(F.col("c_emb"), F.col("q_emb"), F.col("c_norm"), F.col("q_norm"))
    w_probe = W.partitionBy("query_id").orderBy(F.desc("pcos"), F.asc("cell_id"))
    probes = (
        q.join(F.broadcast(cents))
        .select("query_id", "q_emb", "q_norm", "cell_id", probe_cos.alias("pcos"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "q_norm", "cell_id")
    )
    # search only the probed cells (bucket equi-join on cell_id)
    pair_cos = F.round(
        _pair_cos(F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("_norm")), 6
    ).cast("decimal(10,6)")
    w_topk = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        indexed.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            pair_cos.alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w_topk))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
        .orderBy("query_id", "rnk")
    )


def _hyperplanes(dim: int = 64, n_planes: int = 8) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed seed, no RNG state)."""
    import math

    planes = []
    for p in range(n_planes):
        # xorshift-ish deterministic stream; good enough for LSH directions
        vals = []
        state = (p + 1) * 2654435761 % (2**32)
        for _ in range(dim):
            state ^= (state << 13) % (2**64)
            state ^= state >> 7
            state ^= (state << 17) % (2**64)
            state %= 2**64
            vals.append((state / 2**64) * 2.0 - 1.0)
        norm = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / norm for v in vals])
    return planes


@register(
    "sim_lsh_bucketed_neardup",
    oracle=None,  # hyperplane-LSH pipeline: rows-only check
    survey_ids=["K2", "K1"],
    doc="Scale path: random-hyperplane LSH — 8-bit sign sketch per vector, "
        "bucket equi-join, cosine verify ≥ 0.35. Candidate cost ∝ Σ bucket² "
        "(≈N²/256 for balanced buckets) instead of N²; buckets co-locate "
        "via one hash shuffle.",
)
def sim_lsh_bucketed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    bucket = None
    for i, plane in enumerate(planes):
        bit = (
            F.when(
                dot_product(F.col("embedding"), F.array(*[F.lit(v) for v in plane])) >= 0,
                F.lit(1 << i),
            ).otherwise(F.lit(0))
        )
        bucket = bit if bucket is None else bucket + bit
    sk = _with_norm(e.select("vec_id", "embedding", bucket.alias("bucket")))
    a, b = sk.alias("a"), sk.alias("b")
    cos = F.round(
        _pair_cos_arrow(F.col("a.embedding"), F.col("b.embedding"),
                        F.col("a._norm"), F.col("b._norm")), 6
    ).cast("decimal(10,6)")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.35)
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
        .orderBy("vec_a", "vec_b")
    )
