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
    plane_sign_word_arrow,
)
from ..io import load_table


def _with_norm(df, emb_col: str = "embedding"):
    """Precompute the L2 norm once per row — pair-wise cosine then costs
    one dot product instead of a dot plus two norms (3× less math in the
    candidate loop; identical doubles: same ops in the same order)."""
    return df.withColumn("_norm", l2_norm(F.col(emb_col)))


def _pair_cos(a_emb, b_emb, a_norm, b_norm):
    # try_divide: zero-norm rows produce NULL cosine (dropped by every
    # downstream threshold), never an ANSI divide-by-zero stage failure
    return F.try_divide(dot_product(a_emb, b_emb), a_norm * b_norm)


def _pair_cos_arrow(a_emb, b_emb, a_norm, b_norm):
    """Arrow-batched pair cosine for candidate-VERIFICATION stages, where
    pair count ≫ row count (see dot_product_arrow).  Norms stay JVM-side:
    computed once per row before the join, not per pair."""
    return F.try_divide(dot_product_arrow(a_emb, b_emb), a_norm * b_norm)

def _sql_cos(a: str, b: str) -> str:
    """Degenerate-input-safe cosine for oracle SQL, matching the
    engine's try_divide semantics exactly: NULL for zero-norm, NULL,
    or empty vectors.  Built from list comprehensions + list_sum, NOT
    list_cosine_similarity (returns -1.0 for a zero vector) and NOT
    list_dot_product (RAISES on NULL/empty/ragged lists — and DuckDB's
    vectorized CASE still evaluates it on guarded-out rows, so a CASE
    wrapper cannot save it).  list_sum over the in-order comprehension
    folds in the same sequence as the engine's left fold."""
    dot = (f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)"
           f" for i in range(1, len({a}) + 1)])")
    na = (f"sqrt(list_sum(list_transform(CAST({a} AS DOUBLE[]),"
          f" x -> x * x)))")
    nb = (f"sqrt(list_sum(list_transform(CAST({b} AS DOUBLE[]),"
          f" x -> x * x)))")
    # no-NULL-lane guard: DuckDB's list_sum SKIPS NULL products (a
    # partial dot/norm) while the engine's Catalyst fold and Arrow
    # kernels null-propagate the whole cosine — a vector with a NULL
    # element must be NULL on both sides
    lanes = (f"len(list_filter({a}, x -> x IS NULL)) = 0"
             f" AND len(list_filter({b}, x -> x IS NULL)) = 0")
    return f"(CASE WHEN {lanes} THEN {dot} / ({na} * {nb}) END)"


_ORACLE_COS = _sql_cos("a.embedding", "b.embedding")


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


def _bucket_sql(emb_expr: str = "embedding",
                planes: list[list[float]] | None = None) -> str:
    """SQL twin of plane_sign_word_arrow for the DuckDB oracles (plane
    literals embedded at full repr precision — parses to the identical
    doubles; the in-order comprehension dot folds in the same sequence
    the Arrow kernel accumulates, so sign bits match bitwise).  The
    whole word is guarded on vector validity: the Arrow kernel emits a
    SQL NULL bucket for NULL/empty/ragged rows (_stack_valid), and a
    comprehension-based dot (unlike list_inner_product) cannot raise on
    them."""
    plane_list = planes if planes is not None else _hyperplanes()
    dim = len(plane_list[0])
    terms = []
    for i, plane in enumerate(plane_list):
        lits = ", ".join(repr(v) for v in plane)
        dot = (f"list_sum([CAST({emb_expr}[i] AS DOUBLE)"
               f" * (CAST([{lits}] AS DOUBLE[]))[i]"
               f" for i in range(1, len({emb_expr}) + 1)])")
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    word = " + ".join(terms)
    # validity guard mirrors _stack_valid exactly: NULL vector, wrong
    # width, or a NULL lane (list_sum would silently skip it and emit a
    # partial-dot sign word the Arrow kernel never produces) -> NULL
    return (f"(CASE WHEN {emb_expr} IS NOT NULL"
            f" AND len({emb_expr}) = {dim}"
            f" AND len(list_filter({emb_expr}, x -> x IS NULL)) = 0"
            f" THEN {word} END)")


# banded multi-table LSH for near-dup blocking: T tables of B planes each;
# a pair is a candidate if ANY table's bucket matches (OR-amplification —
# recall 1-(1-p^B)^T vs the single-table p^(T*B), same reason minhash
# bands beat one long signature). Tables share one 16-plane sketch pass.
_NEARDUP_TABLES = 4
_NEARDUP_PLANES_PER_TABLE = 4


def _neardup_tables() -> list[list[list[float]]]:
    planes = _hyperplanes(n_planes=_NEARDUP_TABLES * _NEARDUP_PLANES_PER_TABLE)
    b = _NEARDUP_PLANES_PER_TABLE
    return [planes[t * b:(t + 1) * b] for t in range(_NEARDUP_TABLES)]


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
    # argmax as an AGGREGATE, not a row_number window (r17, guide §2.3):
    # max(struct(cos, -centroid)) reproduces the window's `desc(cos)
    # NULLS LAST, asc(centroid_id)` rn=1 pick exactly (the r16-pinned
    # _best_cell ordering argument: non-NULL cos beats NULL, ties fall
    # to the smallest centroid), and the aggregate PARTIAL-aggregates
    # map-side — the vec_id exchange carries one best-so-far row per
    # vector instead of one row per (vector x centroid), and the
    # window's per-partition sort disappears.  Cosines stay in the
    # codegen'd join projection (the r16 nested-HOF rewrite moved them
    # into interpreted lambdas and measured 30-80% slower — reverted).
    assigned = scored.groupBy("vec_id").agg(
        F.max(F.struct(
            F.col("cos_sim"),
            (-F.col("centroid_id")).alias("_neg"),
            F.col("centroid_id").alias("centroid_id"),
        )).alias("_b")
    ).select(F.col("_b.centroid_id").alias("centroid_id"),
             F.col("_b.cos_sim").alias("cos_sim"))
    return assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("cos_sim"), 6).cast("decimal(10,6)").cast("double").alias("avg_cos"),
    )


def _neardup_oracle() -> str:
    buckets = ", ".join(
        f"{_bucket_sql('embedding', tbl)} AS b{t}"
        for t, tbl in enumerate(_neardup_tables())
    )
    tables = " UNION ALL ".join(
        f"SELECT vec_id, label, embedding, {t} AS table_id, b{t} AS bucket FROM sk"
        for t in range(_NEARDUP_TABLES)
    )
    return f"""
    WITH sk AS (
      SELECT vec_id, label, embedding, {buckets}
      FROM embeddings
    ),
    bands AS ({tables}),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
             a.embedding AS emb_a, b.embedding AS emb_b
      FROM bands a JOIN bands b
        ON a.table_id = b.table_id AND a.bucket = b.bucket
       AND a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           CAST(CAST(ROUND({_sql_cos('emb_a', 'emb_b')}, 6)
                AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim
    FROM cand
    WHERE ROUND({_sql_cos('emb_a', 'emb_b')}, 6) >= 0.35
    """


@register(
    "sim_embedding_neardup",
    oracle=_neardup_oracle(),
    survey_ids=["K1", "K2"],
    doc="Embedding-cosine near-duplicate pairs via banded multi-table "
        "hyperplane LSH (4 tables × 4 planes, OR-amplified — recall "
        "1-(1-p^4)^4 at the 0.35 threshold vs p^16 single-table): "
        "candidate pairs only form inside a (table, bucket, label) "
        "blocking key, never per-label (low cardinality → quadratic "
        "blocks) and never a cross join. The oracle replays the "
        "identical 16-plane sketch.",
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _with_norm(load_table(spark, sf_dir, "embeddings"))
    # all 16 plane signs in ONE Arrow kernel; per-table 4-bit buckets are
    # then integer slices of the word (plane 4t+j <-> table t bit j, the
    # same numbering _bucket_sql gives the oracle's per-table sketches)
    b = _NEARDUP_PLANES_PER_TABLE
    word = plane_sign_word_arrow(
        "embedding", _hyperplanes(n_planes=_NEARDUP_TABLES * b)
    )
    # blocking rows carry ONLY (vec_id, label, table_id, bucket) — the
    # 64-float vectors would otherwise ride the explode (4 copies per
    # side) through the self-join shuffle AND the pair dedup; ids-only
    # blocking cuts the dominant shuffle bytes ~4x, and the vectors join
    # back exactly once per deduped pair side
    sk = e.select(
        "vec_id", "label", word.alias("_w")
    ).select(
        "vec_id", "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        F.shiftrightunsigned("_w", t * b)
                        .bitwiseAND(F.lit((1 << b) - 1)).alias("bucket"),
                    )
                    for t in range(_NEARDUP_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "label", "tb.table_id", "tb.bucket")
    a, bb = sk.alias("a"), sk.alias("b")
    cand_ids = (
        a.join(
            bb,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])  # OR across tables
    )
    vecs_a = e.select(F.col("vec_id").alias("vec_a"),
                      F.col("embedding").alias("emb_a"),
                      F.col("_norm").alias("norm_a"))
    vecs_b = e.select(F.col("vec_id").alias("vec_b"),
                      F.col("embedding").alias("emb_b"),
                      F.col("_norm").alias("norm_b"))
    cand = cand_ids.join(vecs_a, "vec_a").join(vecs_b, "vec_b")
    cos = F.round(
        _pair_cos_arrow(F.col("emb_a"), F.col("emb_b"),
                        F.col("norm_a"), F.col("norm_b")), 6
    ).cast("decimal(10,6)")
    return (
        cand.select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.35)
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
    )


_IVF_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    cents AS (SELECT vec_id AS cell_id, emb AS c_emb FROM e WHERE vec_id < 16),
    assigned AS (
      SELECT vec_id, emb, cell_id FROM (
        SELECT v.vec_id, v.emb, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY CAST(ROUND({_sql_cos('c.c_emb', 'v.emb')}, 6)
                               AS DECIMAL(10,6)) DESC, c.cell_id) AS rn
        FROM e v CROSS JOIN cents c)
      WHERE rn = 1),
    probes AS (
      SELECT query_id, q_emb, cell_id FROM (
        SELECT q.vec_id AS query_id, q.emb AS q_emb, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY CAST(ROUND({_sql_cos('c.c_emb', 'q.emb')}, 6)
                               AS DECIMAL(10,6)) DESC, c.cell_id) AS rn
        FROM e q CROSS JOIN cents c WHERE q.vec_id < 8)
      WHERE rn <= 4)
    SELECT query_id, neighbor_id, CAST(cos_sim AS DOUBLE) AS cos_sim,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(ROUND({_sql_cos('a.emb', 'p.q_emb')}, 6)
                  AS DECIMAL(10,6)) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY p.query_id
               ORDER BY CAST(ROUND({_sql_cos('a.emb', 'p.q_emb')}, 6)
                             AS DECIMAL(10,6)) DESC, a.vec_id) AS rnk
      FROM assigned a JOIN probes p ON a.cell_id = p.cell_id
      WHERE a.vec_id <> p.query_id)
    WHERE rnk <= 5
"""


@register(
    "sim_ivf_probe_topk",
    oracle=_IVF_ORACLE,
    survey_ids=["K2"],
    doc="IVF probe-time search: assign corpus to C=16 coarse centroids "
        "(one broadcast pass), then for each query scan only its nprobe=4 "
        "nearest cells — a bucket equi-join on cell id touching ~nprobe/C "
        "of the corpus instead of all of it. The partition-pruned ANN "
        "layout for 100 TB: cells map to partitions of a bucketed table. "
        "Assignment/probe ordering uses 6dp-rounded cosines with id "
        "tiebreaks, making the two-stage search engine-reproducible — the "
        "DuckDB oracle replays it stage by stage (full three-way check).",
)
def sim_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_cells, nprobe, k = 16, 4, 5
    e = _with_norm(load_table(spark, sf_dir, "embeddings"))
    cents = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("c_emb"),
        F.col("_norm").alias("c_norm"),
    )
    cell_cos = F.round(
        _pair_cos(F.col("c_emb"), F.col("embedding"), F.col("c_norm"), F.col("_norm")), 6
    ).cast("decimal(10,6)")
    # index build: nearest centroid per vector (IVF assignment).
    # argmax as a map-side-combinable aggregate instead of a row_number
    # window (r17, guide §2.3 — see sim_nearest_centroid): the vec_id
    # exchange carries ONE best-so-far row per vector (embedding
    # included once) instead of n_cells scored copies, and the window
    # sort is gone; any_value is exact because vec_id is unique and the
    # payload columns are constant within a group.
    indexed = (
        e.join(F.broadcast(cents))
        .select("vec_id", "embedding", "_norm", "cell_id", cell_cos.alias("cos"))
        .groupBy("vec_id")
        .agg(
            F.max(F.struct(
                F.col("cos"),
                (-F.col("cell_id")).alias("_neg"),
                F.col("cell_id").alias("cell_id"),
            )).alias("_b"),
            F.any_value("embedding").alias("embedding"),
            F.any_value("_norm").alias("_norm"),
        )
        .select("vec_id", "embedding", "_norm",
                F.col("_b.cell_id").alias("cell_id"))
    )
    # probe: nprobe nearest cells per query
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
    )
    probe_cos = F.round(
        _pair_cos(F.col("c_emb"), F.col("q_emb"), F.col("c_norm"), F.col("q_norm")), 6
    ).cast("decimal(10,6)")
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


@register(
    "sim_lsh_bucketed_neardup",
    oracle=f"""
    WITH sk AS (
      SELECT vec_id, embedding, {_bucket_sql("embedding")} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(CAST(ROUND({_ORACLE_COS}, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim
    FROM sk a JOIN sk b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND({_ORACLE_COS}, 6) >= 0.35
    """,
    survey_ids=["K2", "K1"],
    doc="Scale path: random-hyperplane LSH — 8-bit sign sketch per vector, "
        "bucket equi-join, cosine verify ≥ 0.35. Candidate cost ∝ Σ bucket² "
        "(≈N²/256 for balanced buckets) instead of N²; buckets co-locate "
        "via one hash shuffle. The oracle replays the identical plane "
        "sketch (full three-way driver check, not rows-only).",
)
def sim_lsh_bucketed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    sk = _with_norm(e.select(
        "vec_id", "embedding",
        plane_sign_word_arrow("embedding", _hyperplanes()).alias("bucket"),
    ))
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


# ------------------------------------------------- k-means refinement --

_KMEANS_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cell_id, emb AS c_emb FROM e WHERE vec_id < 16),
    a0 AS (
      SELECT vec_id, emb, cell_id FROM (
        SELECT v.vec_id, v.emb, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY CAST(ROUND({_sql_cos('c.c_emb', 'v.emb')}, 6)
                               AS DECIMAL(10,6)) DESC, c.cell_id) AS rn
        FROM e v CROSS JOIN c0 c) WHERE rn = 1),
    m AS (
      SELECT cell_id, i,
             SUM(CAST(emb[i] AS DECIMAL(28,12))) AS s, COUNT(*) AS n
      FROM a0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
      GROUP BY cell_id, i),
    c1 AS (
      SELECT cell_id, list(CAST(s AS DOUBLE) / n ORDER BY i) AS c_emb
      FROM m GROUP BY cell_id),
    a1 AS (
      SELECT vec_id, cell_id, cos FROM (
        SELECT v.vec_id, c.cell_id,
               CAST(ROUND({_sql_cos('c.c_emb', 'v.emb')}, 6)
                    AS DECIMAL(10,6)) AS cos,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY CAST(ROUND({_sql_cos('c.c_emb', 'v.emb')}, 6)
                               AS DECIMAL(10,6)) DESC, c.cell_id) AS rn
        FROM e v CROSS JOIN c1 c) WHERE rn = 1)
    SELECT cell_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(CAST(ROUND(CAST(SUM(cos) AS DOUBLE) / COUNT(*), 6)
                AS DECIMAL(10,6)) AS DOUBLE) AS avg_cos
    FROM a1 GROUP BY cell_id
"""


@register(
    "sim_kmeans_refine",
    oracle=_KMEANS_ORACLE,
    survey_ids=["K2"],
    doc="One Lloyd iteration refining the IVF coarse quantizer: assign "
        "every vector to its nearest seed centroid, recompute centroids "
        "as per-dimension means, re-assign, and report per-cell size + "
        "mean cosine compactness. The iterative-ML-on-DataFrames "
        "pattern with EXACT cross-engine parity: per-dimension sums "
        "accumulate in DECIMAL(28,12) (associative, order-independent "
        "— float partial-aggregation order differs between engines and "
        "runs), and the mean is decimal-sum cast to double over the "
        "count, which is correctly rounded and identical everywhere. "
        "Scale shape: assignment is a broadcast join against 16 "
        "centroids (map-side); the centroid update is one groupBy "
        "(cell, dim) shuffle of scalar values.",
)
def sim_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_cells = 16
    e = _with_norm(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding", "_norm"
    )

    def assign(cents: DataFrame) -> DataFrame:
        # argmax aggregate, not a row_number window (r17, guide §2.3 —
        # see sim_nearest_centroid): partial aggregation collapses the
        # n_cells scored copies per vector BEFORE the vec_id exchange,
        # so each Lloyd assignment shuffles one embedding per vector
        # instead of sixteen, with no per-partition window sort
        cos = F.round(
            _pair_cos(F.col("c_emb"), F.col("embedding"),
                      F.col("c_norm"), F.col("_norm")), 6
        ).cast("decimal(10,6)")
        return (
            e.join(F.broadcast(cents))
            .select("vec_id", "embedding", "cell_id", cos.alias("cos"))
            .groupBy("vec_id")
            .agg(
                F.max(F.struct(
                    F.col("cos"),
                    (-F.col("cell_id")).alias("_neg"),
                    F.col("cell_id").alias("cell_id"),
                )).alias("_b"),
                F.any_value("embedding").alias("embedding"),
            )
            .select("vec_id", "embedding",
                    F.col("_b.cell_id").alias("cell_id"),
                    F.col("_b.cos").alias("cos"))
        )

    cents0 = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("c_emb"),
        F.col("_norm").alias("c_norm"),
    )
    a0 = assign(cents0)
    dims = a0.select("cell_id", F.posexplode("embedding").alias("pos", "val"))
    m = dims.groupBy("cell_id", "pos").agg(
        F.sum(F.col("val").cast("decimal(28,12)")).alias("s"),
        F.count("*").alias("n"),
    )
    cents1 = (
        m.select("cell_id", "pos",
                 (F.col("s").cast("double") / F.col("n")).alias("mv"))
        .groupBy("cell_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda x: x["mv"],
            ).alias("c_emb")
        )
        .withColumn("c_norm", l2_norm(F.col("c_emb")))
    )
    a1 = assign(cents1)
    avg = F.sum("cos").cast("double") / F.count("*")
    return a1.groupBy("cell_id").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.round(avg, 6).cast("decimal(10,6)").cast("double").alias("avg_cos"),
    )
