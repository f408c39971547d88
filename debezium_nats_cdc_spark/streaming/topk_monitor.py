"""Incremental top-k similarity monitoring (SURVEY §2.K2's "incremental
top-k per the EDBT 2020 paper" mapping).

Standing cosine queries over a GROWING vector corpus: as new embeddings
stream in, each query's top-k updates by merging the batch-local top-k
into the stored result — the incremental-maintenance idea of the EDBT
2020 framework (top-k over interactive sessions: reuse the previous
answer, touch only the delta) re-expressed for Structured Streaming.
Cost per micro-batch is O(|batch| x |queries|) + a |Q|*2k merge —
independent of corpus size, where re-running the batch query
(`sim_cosine_topk`) would rescan everything ever ingested.

State is one tiny table (|Q| x k rows: query_id, neighbor_id, cos_sim)
swap-written per batch through the StateBackend seam.  The merge is
IDEMPOTENT — dedup on (query_id, neighbor_id) keeps the max cosine
before re-ranking — so a replayed micro-batch converges to the same
state (no epoch keying needed: f(state, batch) == f(f(state, batch),
batch)).

Scale path: the per-batch candidate step is the brute-force broadcast
(every query sees every new vector — exact, and the batch is the small
side).  If |queries| x |batch| ever dominates, ``prefilter=True``
swaps it for the banded hyperplane sketch (embedding_dedup._sketch):
only (query, vector) pairs colliding in >=1 of the T=4 x B=8-bit
bucket tables are scored — the merge machinery is unchanged, and every
RETURNED score is still the exact cosine (the filter narrows the
candidate set, never the scores; tests pin filtered ⊆ exact).

Prefilter recall statement (sign-random-projection collision math,
p = 1 - theta/pi per plane, 1-(1-p^B)^T over tables; property-tested in
tests/test_topk_monitor.py): a true neighbor at cosine 0.99 survives
the filter with p ≈ 0.99, at 0.92 with p ≈ 0.80, while a random 64-dim
direction (cos ≈ 0) collides with p ≈ 0.016 — so the filtered path is
the right trade exactly when the standing answer tracks NEAR
neighbors; for exhaustive low-similarity top-k keep the exact default.

Measured cutover (tools/ab_topk_prefilter.py, BENCHLOG r7): below ~5M
query x batch pairs per micro-batch the exact Arrow kernel wins (1M
pairs: 5.3 s vs 6.0 s); above it the filter dominates (32.8M pairs:
8-9.5 s vs 36-112 s, 4-12x) — the broadcast product, not the cosine,
is what stops scaling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators.similarity import _pair_cos_arrow, _with_norm
from .state_backend import LocalFSBackend, StateBackend


class TopKMonitor:
    """foreachBatch-driven standing top-k queries over a vector stream."""

    def __init__(self, root: str, queries: DataFrame, k: int = 5,
                 backend: StateBackend | None = None,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 prefilter: bool = False):
        self.state_dir = os.path.join(root, "topk")
        self.checkpoint_dir = os.path.join(root, "_checkpoints")
        self.backend = backend or LocalFSBackend()
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col
        self.prefilter = prefilter
        # standing queries: captured once, tiny, broadcast every batch
        self.queries = _with_norm(
            queries.select(F.col(id_col).alias("query_id"),
                           F.col(emb_col).alias("embedding"))
            .filter(F.col("embedding").isNotNull())
        ).select("query_id", F.col("embedding").alias("q_emb"),
                 F.col("_norm").alias("q_norm")).localCheckpoint(eager=True)
        if prefilter:
            from .embedding_dedup import _sketch

            # query bucket table: sketched ONCE, ids-only, broadcast
            # against each batch's sketches (see module docstring for
            # the recall statement of this filter)
            self.query_buckets = (
                _sketch(self.queries, id_col="query_id", emb_col="q_emb")
                .select("table_id", "bucket", "query_id")
                .localCheckpoint(eager=True)
            )

    def current(self, spark: SparkSession) -> DataFrame:
        """The standing answer: (query_id, neighbor_id, cos_sim, rnk)."""
        if not self.backend.has_data(self.state_dir):
            return spark.createDataFrame(
                [], "query_id long, neighbor_id long, cos_sim double, rnk int")
        w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                              F.asc("neighbor_id"))
        return (
            spark.read.parquet(self.state_dir)
            .withColumn("rnk", F.row_number().over(w).cast("int"))
            .orderBy("query_id", "rnk")
        )

    def process_batch(self, spark: SparkSession, vecs: DataFrame,
                      epoch_id: int | None = None) -> None:
        vecs = vecs.localCheckpoint(eager=True)
        if vecs.isEmpty():
            return
        self.backend.recover(self.state_dir)
        v = _with_norm(
            vecs.select(F.col(self.id_col).alias("neighbor_id"),
                        F.col(self.emb_col).alias("embedding"))
            .filter(F.col("embedding").isNotNull())
        )
        cos = F.round(_pair_cos_arrow(
            F.col("q_emb"), F.col("embedding"),
            F.col("q_norm"), F.col("_norm")), 6).cast("decimal(10,6)")
        w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                              F.asc("neighbor_id"))
        if self.prefilter:
            from .embedding_dedup import _sketch

            # only bucket-colliding (query, vector) pairs get scored:
            # O(collisions) instead of |batch| x |Q|
            pairs = (
                _sketch(v, id_col="neighbor_id", emb_col="embedding")
                .select("table_id", "bucket", "neighbor_id")
                .join(F.broadcast(self.query_buckets),
                      ["table_id", "bucket"])
                .select("query_id", "neighbor_id")
                .dropDuplicates()          # OR across tables
            )
            scored = (pairs.join(v, "neighbor_id")
                      .join(F.broadcast(self.queries), "query_id"))
        else:
            scored = v.join(F.broadcast(self.queries))
        batch_topk = (
            scored
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id",
                    cos.cast("double").alias("cos_sim"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= self.k)
            .drop("_rn")
        )
        if self.backend.has_data(self.state_dir):
            prev = spark.read.parquet(self.state_dir)
            merged = prev.unionByName(batch_topk)
        else:
            merged = batch_topk
        # idempotent merge: a replayed batch's rows dedup away before
        # the re-rank, so state converges to the same answer
        new_state = (
            merged.groupBy("query_id", "neighbor_id")
            .agg(F.max("cos_sim").alias("cos_sim"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= self.k)
            .drop("_rn")
            .coalesce(1)
        )
        # swap_write stages to a fresh path — the plan's read of the
        # current state parquet needs no lineage break
        self.backend.swap_write(new_state, self.state_dir)

    def start(self, spark: SparkSession, stream: DataFrame,
              available_now: bool = True):
        writer = (
            stream.writeStream.queryName("topk-monitor")
            .option("checkpointLocation", self.checkpoint_dir)
            .foreachBatch(lambda b, e: self.process_batch(spark, b, e))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
