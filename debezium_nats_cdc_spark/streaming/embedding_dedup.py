"""Streaming embedding dedup: incremental cosine near-dup over a vector
stream (the K2 twin of streaming/corpus_dedup.py's text path).

An embedding INGEST pipeline asks, as new vectors arrive (document
embeddings, image features): which are near-duplicates — cosine above a
threshold — of anything already accepted?  Emit the fresh ones,
quarantine the dups with their match, and grow the index.  Batch-mode
`sim_embedding_neardup` (operators/similarity.py:228) answers the
within-corpus question; this class answers it against an unbounded,
continuously-growing corpus with exactly-once sinks.

Design (no cross join anywhere, mirrors corpus_dedup):
- Sketch each vector ONCE into T=4 hyperplane tables of B=8 planes
  (32 sign bits from one Arrow kernel pass, the same deterministic
  planes as the batch op but 8 bits/table: 256 buckets per table keeps
  per-bucket candidate counts bounded at ingest batch sizes; the batch
  op's 4-bit tables are tuned for one-shot self-joins at sf0.01).
- The accumulated state is a BUCKET INDEX, an append-only parquet log.
  Default layout ("norm", A/B-chosen r7): ids-only (table_id, bucket,
  vec_id) rows plus a vectors-once sibling store joined only for the
  COLLIDING candidates; "denorm" keeps the vector in every bucket row
  (x4 space) for a join-free verify.  At 100 TB either is a bucketed
  table co-located with the probe join.
- Per micro-batch: probe = equi-join batch sketches vs index on
  (table_id, bucket), verify candidates with an Arrow pair-cosine, keep
  matches >= threshold (the index vector always wins — it arrived
  first).  Intra-batch dups resolve through the same capped
  group-then-expand kernel as the text path (lowest vec_id wins,
  over-cap buckets degrade to anchor matching, never dropped).
- dup_of must point at an ACCEPTED vector: pointer-jump chains exactly
  like corpus_dedup (intra targets strictly decrease; index targets are
  terminal).
- EXACTLY-ONCE under micro-batch replay: accepted/quarantine/index all
  publish through the epoch-keyed commit protocol (streaming/txn.py via
  the StateBackend seam), and the index heals torn compactions BEFORE
  probing (the corpus_dedup crash lesson).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.vectors import l2_norm, plane_sign_word_arrow
from ..operators.similarity import _hyperplanes, _pair_cos_arrow
from ._ingest_base import FormatStampedIndexIngest, pointer_jump

log = logging.getLogger(__name__)

N_TABLES = 4
PLANES_PER_TABLE = 8
COS_THRESHOLD = 0.92
INTRA_BUCKET_CAP = 1000

# signature family persisted in the index; bump when planes/threshold
# derivation changes (stale sketches would match nothing — same failure
# mode as corpus_dedup.INDEX_FORMAT)
INDEX_FORMAT = f"hyperplane-{N_TABLES}x{PLANES_PER_TABLE}-v1"
INDEX_COMPACT_THRESHOLD = 48


def _sketch(vecs: DataFrame, id_col: str = "vec_id",
            emb_col: str = "embedding") -> DataFrame:
    """(id, embedding) -> one row per table: (table_id, bucket, id,
    embedding, norm).  All T*B plane signs come from ONE Arrow kernel
    pass; per-table buckets are integer slices of the sign word."""
    from ..speccache import per_context

    def build():
        word = plane_sign_word_arrow(
            emb_col, _hyperplanes(n_planes=N_TABLES * PLANES_PER_TABLE))
        tables = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        F.shiftrightunsigned("_w", t * PLANES_PER_TABLE)
                        .bitwiseAND(F.lit((1 << PLANES_PER_TABLE) - 1))
                        .alias("bucket"),
                    )
                    for t in range(N_TABLES)
                ]
            )
        ).alias("tb")
        pre = [F.col(id_col), F.col(emb_col),
               l2_norm(F.col(emb_col)).alias("norm"), word.alias("_w")]
        mid = [F.col(id_col), F.col(emb_col), F.col("norm"), tables]
        out = [F.col("tb.table_id"), F.col("tb.bucket"), F.col(id_col),
               F.col(emb_col), F.col("norm")]
        return pre, mid, out

    pre, mid, out = per_context(
        ("embedding_dedup.sketch", id_col, emb_col), build)
    return vecs.select(*pre).select(*mid).select(*out)


# candidate verification reuses the batch ops' Arrow pair-cosine
# (operators/similarity._pair_cos_arrow) — one kernel to fix, not two
_pair_cos = _pair_cos_arrow


def dedup_batch_against_index(batch_sk: DataFrame,
                              index_sk: DataFrame | None,
                              id_col: str = "vec_id",
                              index_vectors: DataFrame | None = None
                              ) -> DataFrame:
    """Resolve one batch: (vec_id, dup_of, cos_sim) with dup_of NULL for
    accepted vectors.  Candidates come only from bucket collisions —
    probe (batch vs index) and intra-batch — each verified by true
    cosine before any match is claimed.

    Two index layouts (pipeline constructor flag, pytest-pinned equal):
    - denormalized: ``index_sk`` rows carry (table_id, bucket, id,
      embedding, norm) — the vector x N_TABLES, verify is join-free;
    - normalized: ``index_sk`` rows are ids-only (table_id, bucket, id)
      and ``index_vectors`` holds each accepted vector ONCE — candidate
      ids join to the vector store before the cosine verify, so index
      storage shrinks ~N_TABLES x at the cost of one extra equi-join
      over only the COLLIDING candidates (not the corpus).
    """
    from ..speccache import per_context

    probe_matches = None
    if index_sk is not None:
        cand_cols = [
            F.col(f"b.{id_col}").alias("vec_id"),
            F.col(f"i.{id_col}").alias("dup_of"),
            F.col("b.embedding").alias("emb_b"),
            F.col("b.norm").alias("norm_b"),
        ]
        if index_vectors is None:
            cand_cols += [F.col("i.embedding").alias("emb_i"),
                          F.col("i.norm").alias("norm_i")]
        cand = (
            batch_sk.alias("b")
            .join(
                index_sk.alias("i"),
                (F.col("b.table_id") == F.col("i.table_id"))
                & (F.col("b.bucket") == F.col("i.bucket"))
                # replay guard: a partially-committed epoch may have
                # indexed this batch's own vectors already
                & (F.col(f"b.{id_col}") != F.col(f"i.{id_col}")),
            )
            .select(*cand_cols)
            .dropDuplicates(["vec_id", "dup_of"])  # OR across tables
        )
        if index_vectors is not None:
            # fetch the index-side vector for the colliding candidates
            # only; inner join also heals a torn epoch where bucket rows
            # committed before their vector-store rows (the replayed
            # epoch re-appends the missing vectors).  Any OTHER missing
            # vector (store loss/mutation) is silently dropped here —
            # EmbeddingDedupPipeline.check_consistency / strict=True is
            # the loud-failure path for that drift.
            cand = cand.join(
                index_vectors.select(
                    F.col(id_col).alias("dup_of"),
                    F.col("embedding").alias("emb_i"),
                    F.col("norm").alias("norm_i"),
                ),
                "dup_of",
            )
        probe_matches = (
            cand.withColumn("cos_sim", _pair_cos(
                F.col("emb_b"), F.col("emb_i"),
                F.col("norm_b"), F.col("norm_i")))
            .filter(F.col("cos_sim") >= COS_THRESHOLD)
            .groupBy("vec_id")
            .agg(
                F.max_by("dup_of",
                         F.struct(F.col("cos_sim"), -F.col("dup_of"))
                         ).alias("dup_of"),
                F.max("cos_sim").alias("cos_sim"),
            )
        )

    # intra-batch pairs: capped group-then-expand per bucket (the
    # corpus_dedup kernel with (sig -> embedding, est_jaccard -> cosine))
    grouped = (
        batch_sk.groupBy("table_id", "bucket")
        .agg(F.collect_list(
            F.struct(F.col(id_col).alias("id"), "embedding", "norm")
        ).alias("ds"))
        .filter(F.size("ds") >= 2)
    )

    def build_pair_arr():
        ds = F.col("ds")
        full_pairs = F.flatten(
            F.transform(
                ds,
                lambda x: F.transform(
                    F.filter(ds, lambda y: y["id"] > x["id"]),
                    lambda y: F.struct(
                        x["id"].alias("keeper"),
                        y["id"].alias("vec_id"),
                        x["embedding"].alias("emb_a"),
                        y["embedding"].alias("emb_b"),
                        x["norm"].alias("norm_a"),
                        y["norm"].alias("norm_b"),
                    ),
                ),
            )
        )
        anchor = F.element_at(F.array_sort(ds), 1)
        anchor_pairs = F.transform(
            F.filter(ds, lambda y: y["id"] > anchor["id"]),
            lambda y: F.struct(
                anchor["id"].alias("keeper"),
                y["id"].alias("vec_id"),
                anchor["embedding"].alias("emb_a"),
                y["embedding"].alias("emb_b"),
                anchor["norm"].alias("norm_a"),
                y["norm"].alias("norm_b"),
            ),
        )
        return F.when(F.size(ds) <= INTRA_BUCKET_CAP, full_pairs).otherwise(
            anchor_pairs)

    # cap in the key: the built tree freezes the cap value (see
    # corpus_dedup's twin comment)
    pair_arr = per_context(("embedding_dedup.pair_arr", INTRA_BUCKET_CAP),
                           build_pair_arr)
    intra = (
        grouped.select(F.explode_outer(pair_arr).alias("p"))
        .select("p.keeper", "p.vec_id", "p.emb_a", "p.emb_b",
                "p.norm_a", "p.norm_b")
        .dropDuplicates(["keeper", "vec_id"])
        .withColumn("cos_sim", _pair_cos(
            F.col("emb_a"), F.col("emb_b"), F.col("norm_a"), F.col("norm_b")))
        .filter(F.col("cos_sim") >= COS_THRESHOLD)
    )
    intra_matches = intra.groupBy("vec_id").agg(
        F.min("keeper").alias("dup_of"),
        F.max("cos_sim").alias("cos_sim"),
    )

    all_ids = batch_sk.select(id_col).distinct().withColumnRenamed(
        id_col, "vec_id")
    matches = (probe_matches.unionByName(intra_matches)
               if probe_matches is not None else intra_matches)
    best = matches.groupBy("vec_id").agg(
        F.max_by("dup_of", F.struct(F.col("cos_sim"), -F.col("dup_of"))
                 ).alias("dup_of"),
        F.max("cos_sim").alias("cos_sim"),
    )

    # chains terminate exactly as in corpus_dedup: intra targets strictly
    # decrease, probe targets are already-accepted index vectors
    return all_ids.join(pointer_jump(best, "vec_id"), "vec_id", "left")


LAYOUTS = ("denorm", "norm")

# "denorm" stores the vector in every bucket row (x N_TABLES); "norm"
# stores ids-only bucket rows + each vector ONCE in a sibling store.
# Default = norm: the sf0.1 interleaved A/B (tools/ab_embedding_layout,
# BENCHLOG r7: 12k vectors over 6 batches, A-B-B-A x2) measured best
# wall within noise (13.36 vs 13.43 s) but norm ahead on median (14.66
# vs 15.86 s) AND 33% smaller index bytes at 64-dim — and the storage
# gap only widens with vector width (at 4 KB/vector the cut is ~4x),
# so the normalized layout is the scale default; "denorm" remains for
# probe-join-free reads of the index itself.
DEFAULT_LAYOUT = "norm"


class EmbeddingDedupPipeline(FormatStampedIndexIngest):
    """foreachBatch-driven incremental embedding dedup with an on-disk
    bucket index.  Index/sink/compaction/start machinery lives in
    _ingest_base; this class owns only the vector sketch + batch
    resolution.

    ``layout="norm"`` (default, A/B-chosen — see DEFAULT_LAYOUT)
    persists ids-only bucket rows plus a vectors-once store at
    ``vectors_dir``; ``layout="denorm"`` persists (table_id, bucket,
    vec_id, embedding, norm) bucket rows.  The two
    are result-identical (pytest-pinned); the format stamp carries the
    layout so an index can never be probed under the wrong one."""

    QUERY_NAME = "embedding-dedup"
    INDEX_DIR_NAME = "bucket_index"
    INDEX_NOUN = "bucket index"
    FORMAT_NOUN = "sketch format"

    def __init__(self, root: str, backend=None,
                 layout: str = DEFAULT_LAYOUT, strict: bool = False):
        if layout not in LAYOUTS:
            raise ValueError(f"layout must be one of {LAYOUTS}, "
                             f"got {layout!r}")
        super().__init__(root, backend)
        self.layout = layout
        self.strict = strict
        self.vectors_dir = os.path.join(root, "vector_store")

    def check_consistency(self, spark: SparkSession) -> dict:
        """Norm-layout drift probe: count distinct index vec_ids that
        have NO row in the vector store.

        The designed torn-epoch shapes heal through replay (the probe's
        own-id guard plus re-appended vectors), but any OTHER store/index
        inconsistency — partial data loss, external mutation — would
        otherwise degrade silently: the probe's inner join to the vector
        store drops the candidate and the pipeline accepts a
        near-duplicate instead of failing.  This check makes that drift
        loud.  Returns ``{"index_ids": n, "store_ids": n, "missing": n}``
        (all zero for denorm/empty).  With ``strict=True`` the pipeline
        runs it after any micro-batch in which a compaction actually ran
        (the directory-replacing operation the probe exists to audit)
        and raises on missing > 0 — a full ids-only scan of both stores,
        so it is a debug mode, not the production default.
        """
        out = {"index_ids": 0, "store_ids": 0, "missing": 0}
        # heal torn compactions first: invoked standalone after a crashed
        # swap_write this would otherwise read a half-swapped directory
        # and misreport drift (process_batch does the same before probing)
        self.backend.recover(self.index_dir)
        if self.layout == "norm":
            self.backend.recover(self.vectors_dir)
        if self.layout != "norm" or not self.backend.has_data(self.index_dir):
            return out
        idx_ids = (spark.read.parquet(self.index_dir)
                   .select("vec_id").distinct())
        if self.backend.has_data(self.vectors_dir):
            store_ids = (spark.read.parquet(self.vectors_dir)
                         .select("vec_id").distinct())
        else:
            store_ids = idx_ids.limit(0)
        out["index_ids"] = idx_ids.count()
        out["store_ids"] = store_ids.count()
        out["missing"] = idx_ids.join(store_ids, "vec_id", "left_anti").count()
        if self.strict and out["missing"] > 0:
            raise RuntimeError(
                f"embedding-dedup index/store drift: {out['missing']} of "
                f"{out['index_ids']} indexed vec_ids missing from the "
                f"vector store at {self.vectors_dir} — the probe would "
                "silently accept near-duplicates of these vectors")
        return out

    def _format(self) -> str:
        # module global: test-monkeypatchable; layout participates so a
        # norm index read as denorm (missing embedding columns) refuses
        # loudly instead of failing mid-probe
        fmt = INDEX_FORMAT
        return fmt if self.layout == "denorm" else f"{fmt}+norm"

    def _compact_threshold(self) -> int:
        return INDEX_COMPACT_THRESHOLD

    def process_batch(self, spark: SparkSession, vecs: DataFrame,
                      epoch_id: int | None = None) -> None:
        vecs = vecs.localCheckpoint(eager=True)
        if vecs.isEmpty():
            return
        # heal a torn compaction BEFORE probing (corpus_dedup lesson: a
        # torn index reads as empty and silently accepts near-dups)
        self.backend.recover(self.index_dir)
        if self.layout == "norm":
            self.backend.recover(self.vectors_dir)
        self._stamp_format()
        sk = _sketch(vecs).localCheckpoint(eager=True)
        index_sk = self._index(spark)
        index_vecs = None
        if self.layout == "norm" and index_sk is not None:
            if self.backend.has_data(self.vectors_dir):
                index_vecs = spark.read.parquet(self.vectors_dir)
            else:
                # torn first epoch: bucket rows committed, vector store
                # not.  Those rows are this batch's own ids (excluded by
                # the probe's id guard) — an empty store keeps the
                # normalized join path and the replay re-appends them.
                index_vecs = sk.select("vec_id", "embedding", "norm").limit(0)
        verdict = dedup_batch_against_index(sk, index_sk,
                                            index_vectors=index_vecs)
        verdict = verdict.localCheckpoint(eager=True)

        dup_ids = verdict.filter(F.col("dup_of").isNotNull())
        accepted_ids = verdict.filter(F.col("dup_of").isNull()).select("vec_id")

        self._append(vecs.join(dup_ids, "vec_id", "inner"),
                     self.quarantine_dir, "quarantine", epoch_id)
        self._append(vecs.join(accepted_ids, "vec_id", "left_semi"),
                     self.accepted_dir, "accepted", epoch_id)
        accepted_sk = sk.join(accepted_ids, "vec_id", "left_semi")
        if self.layout == "norm":
            self._append(accepted_sk.select("table_id", "bucket", "vec_id"),
                         self.index_dir, "index", epoch_id)
            self._append(
                accepted_sk.dropDuplicates(["vec_id"])
                .select("vec_id", "embedding", "norm"),
                self.vectors_dir, "vectors", epoch_id)
        else:
            self._append(accepted_sk, self.index_dir, "index", epoch_id)
        compacted = self._maybe_compact_index(spark)
        if self.layout == "norm":
            compacted |= self._maybe_compact_dir(spark, self.vectors_dir)
            # strict mode pays the full ids-only scan only when a
            # compaction actually replaced a directory this batch — the
            # operation the drift probe exists to audit
            if self.strict and compacted:
                self.check_consistency(spark)
