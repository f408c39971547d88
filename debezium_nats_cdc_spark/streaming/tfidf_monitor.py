"""Streaming TF-IDF drift monitor (SURVEY §2.K3 + §2.H applied to term
salience — VERDICT r8 stretch item 10).

A training-data pipeline pages on CORPUS DRIFT: a crawler update or a
contaminated source suddenly floods the stream with terms that were
rare in everything ingested so far (spam vocabularies, boilerplate,
benchmark strings).  The batch operator `text_tfidf_topk` scores one
static corpus; this monitor maintains the same statistics — per-term
total term frequency ``tf``, document frequency ``df``, corpus size
``n_docs`` — INCREMENTALLY, one merge per micro-batch, and compares
each incoming batch's term distribution against the accumulated corpus
BEFORE folding it in.  The per-batch cost is O(|batch terms| +
|vocabulary|) — independent of how many documents were ever ingested,
where re-running the batch operator would rescan the whole corpus.

Tokenization is byte-for-byte `operators.text._tokens` (lowercase,
split on one literal space) — one token definition per corpus, shared
with every batch text operator and the TF-IDF oracle.

State is ONE swap-written parquet table: vocabulary rows (term, tf,
df) plus a single ``term IS NULL`` meta row carrying (n_docs,
last_epoch).  Keeping the meta in the same atomic swap is what makes
micro-batch replay exactly-once: a replayed epoch compares against
``last_epoch`` and no-ops, and there is no window where the vocabulary
reflects an epoch the meta does not (the corpus_dedup lesson, applied
to aggregate state instead of an append log).

Scale shape: the merge is one hash shuffle keyed on term (map-side
combined); state size is the vocabulary, not the corpus; the drift
report joins the batch's terms (small) against the state (hash join on
term) and keeps only the top-N lifted terms via TakeOrdered.  At 100
TB of ingested text the vocabulary table is the only thing that grows,
and sub-linearly (Heaps' law).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.text import _tokens
from .state_backend import LocalFSBackend, StateBackend

_STATE_SCHEMA = ("term string, tf bigint, df bigint, "
                 "n_docs bigint, last_epoch bigint")
_DRIFT_SCHEMA = ("term string, batch_tf bigint, batch_share double, "
                 "corpus_share double, lift double, is_new boolean")

# smoothing floor for lift when a term has never been seen: treats the
# corpus as if the term had appeared once, so "new term" lifts are
# large-but-finite and comparable (same idea as the +1 IDF smoothing)
_NEW_TERM_FLOOR = 1.0


class TfidfMonitor:
    """foreachBatch-driven incremental df/tf state with batch-vs-corpus
    drift reporting.  ``doc_col`` holds the raw text, ``id_col`` the
    document id (ids only count ``n_docs``; re-ingesting an id is the
    caller's dedup problem, as in the batch operator)."""

    def __init__(self, root: str, backend: StateBackend | None = None,
                 id_col: str = "doc_id", doc_col: str = "text",
                 drift_top_n: int = 20):
        self.backend = backend or LocalFSBackend()
        self.state_dir = os.path.join(root, "tfidf_state")
        self.drift_dir = os.path.join(root, "tfidf_drift")
        self.checkpoint_dir = os.path.join(root, "_checkpoints")
        self.id_col = id_col
        self.doc_col = doc_col
        self.drift_top_n = drift_top_n

    # -- reads ---------------------------------------------------------
    def _state(self, spark: SparkSession) -> DataFrame:
        self.backend.recover(self.state_dir)
        if not self.backend.has_data(self.state_dir):
            return spark.createDataFrame([], _STATE_SCHEMA)
        return spark.read.parquet(self.state_dir)

    def terms(self, spark: SparkSession) -> DataFrame:
        """Accumulated vocabulary: (term, tf, df) over every ingested doc."""
        return (self._state(spark).filter(F.col("term").isNotNull())
                .select("term", "tf", "df"))

    def meta(self, spark: SparkSession) -> tuple[int, int]:
        """(n_docs, last_epoch); (0, -1) before the first batch."""
        row = (self._state(spark).filter(F.col("term").isNull())
               .select("n_docs", "last_epoch").first())
        return (row.n_docs, row.last_epoch) if row else (0, -1)

    def topk_salient(self, spark: SparkSession, k: int = 10) -> DataFrame:
        """Corpus-level top-k terms by total TF-IDF weight — the same
        smoothed idf as `text_tfidf_topk`, over the ACCUMULATED corpus."""
        n_docs, _ = self.meta(spark)
        score = F.round(
            F.col("tf") * (F.log((F.lit(n_docs) + F.lit(1.0))
                                 / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
            6).cast("double")
        return (self.terms(spark)
                .select("term", "tf", "df", score.alias("weight"))
                .orderBy(F.desc("weight"), F.asc("term")).limit(k))

    def latest_drift(self, spark: SparkSession) -> DataFrame:
        """The last batch's drift report: its top-N terms by LIFT =
        batch term share / corpus term share (smoothed for never-seen
        terms, which also carry ``is_new``).  A lift near 1 everywhere
        means the batch looks like the corpus; a large-lift spike is
        the drift alarm."""
        self.backend.recover(self.drift_dir)
        if not self.backend.has_data(self.drift_dir):
            return spark.createDataFrame([], _DRIFT_SCHEMA)
        return spark.read.parquet(self.drift_dir).orderBy(
            F.desc("lift"), F.asc("term"))

    # -- writes --------------------------------------------------------
    def _batch_terms(self, docs: DataFrame) -> DataFrame:
        tok = docs.select(
            F.col(self.id_col).alias("_doc"),
            F.explode(_tokens(F.coalesce(F.col(self.doc_col), F.lit(""))))
             .alias("term"),
        ).filter(F.col("term") != "")
        per_doc = tok.groupBy("_doc", "term").agg(
            F.count("*").cast("bigint").alias("tf"))
        return per_doc.groupBy("term").agg(
            F.sum("tf").cast("bigint").alias("tf"),
            F.count("*").cast("bigint").alias("df"),
        )

    def process_batch(self, spark: SparkSession, docs: DataFrame,
                      epoch_id: int | None = None) -> None:
        docs = docs.localCheckpoint(eager=True)
        if docs.isEmpty():
            return
        n_docs, last_epoch = self.meta(spark)
        if epoch_id is not None and epoch_id <= last_epoch:
            return  # replayed micro-batch: already folded into state
        batch = self._batch_terms(docs).localCheckpoint(eager=True)
        batch_docs = docs.select(self.id_col).count()

        # drift vs the corpus BEFORE this batch is folded in
        self._write_drift(spark, batch)

        merged = (
            self.terms(spark).unionByName(batch)
            .groupBy("term")
            .agg(F.sum("tf").cast("bigint").alias("tf"),
                 F.sum("df").cast("bigint").alias("df"))
            .select("term", "tf", "df",
                    F.lit(None).cast("bigint").alias("n_docs"),
                    F.lit(None).cast("bigint").alias("last_epoch"))
        )
        # ad-hoc (epoch-less) calls must PRESERVE last_epoch: resetting
        # it would let a later replay of an already-folded epoch pass
        # the guard and double-count
        meta = spark.createDataFrame(
            [(None, None, None, n_docs + batch_docs,
              last_epoch if epoch_id is None else epoch_id)], _STATE_SCHEMA)
        # no lineage break needed: swap_write stages the new generation
        # to a fresh path, so the plan's read of the current state
        # parquet races nothing (BENCHLOG round-12 second cut)
        self.backend.swap_write(
            merged.unionByName(meta).repartition(1), self.state_dir)

    def _write_drift(self, spark: SparkSession, batch: DataFrame) -> None:
        corpus = self.terms(spark)
        corpus_tokens = (corpus.agg(F.coalesce(F.sum("tf"), F.lit(0))
                                    .alias("_t")).first()._t)
        batch_tokens = (batch.agg(F.coalesce(F.sum("tf"), F.lit(0))
                                  .alias("_t")).first()._t)
        if batch_tokens == 0:
            return
        joined = batch.select(
            "term", F.col("tf").alias("batch_tf"),
        ).join(corpus.select("term", F.col("tf").alias("_ctf")),
               "term", "left")
        batch_share = F.col("batch_tf") / F.lit(float(batch_tokens))
        # never-seen terms: corpus tf floored at _NEW_TERM_FLOOR over
        # (corpus_tokens + 1) so lift stays finite and comparable
        corpus_share = (
            F.coalesce(F.col("_ctf").cast("double"),
                       F.lit(_NEW_TERM_FLOOR))
            / F.lit(float(corpus_tokens) + 1.0))
        report = (
            joined.select(
                "term", "batch_tf",
                F.round(batch_share, 8).alias("batch_share"),
                F.round(F.when(F.col("_ctf").isNull(), F.lit(0.0))
                        .otherwise(F.col("_ctf") /
                                   F.lit(float(corpus_tokens) + 1.0)),
                        8).alias("corpus_share"),
                F.round(batch_share / corpus_share, 4).alias("lift"),
                F.col("_ctf").isNull().alias("is_new"),
            )
            .orderBy(F.desc("lift"), F.asc("term"))
            .limit(self.drift_top_n)
        )
        self.backend.swap_write(report.coalesce(1), self.drift_dir)

    def reset_epoch_guard(self, spark: SparkSession) -> None:
        """Clear ``last_epoch`` (set to -1, state otherwise unchanged)
        so a stream restarted from a FRESH checkpoint — whose epoch ids
        restart at 0 — can keep folding into the accumulated state.
        Called automatically by ``start`` on a fresh checkpoint; the
        replay guard then only protects within the new checkpoint's
        epoch sequence."""
        state = self._state(spark)
        if state.isEmpty():
            return
        self.backend.swap_write(
            state.withColumn(
                "last_epoch",
                F.when(F.col("term").isNull(), F.lit(-1).cast("bigint"))
                 .otherwise(F.col("last_epoch"))),
            self.state_dir)

    def start(self, spark: SparkSession, stream: DataFrame,
              available_now: bool = True):
        # fresh checkpoint => epoch ids restart at 0.  Without this
        # reset the replay guard (epoch_id <= last_epoch) would
        # silently DROP every batch until the new epoch sequence passes
        # the old high-water mark — the _ingest_base half-reset
        # contract, applied to aggregate state instead of txn markers.
        if not self.backend.checkpoint_established(self.checkpoint_dir):
            self.reset_epoch_guard(spark)
        writer = (
            stream.writeStream.queryName("tfidf-monitor")
            .option("checkpointLocation", self.checkpoint_dir)
            .foreachBatch(lambda b, e: self.process_batch(spark, b, e))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
