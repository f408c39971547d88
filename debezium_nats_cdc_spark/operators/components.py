"""Delta-iteration connected components — the optimized twin of
``dedup.connected_components`` (VERDICT r10 task 3).

``dedup_cluster_assign`` has been the catalog's cost ceiling every
round since r8 (7.61 s driver / 4.3-4.6 s replay at sf0.1, 2-3x the
next heaviest query).  Decomposition (BENCHLOG round-11) splits that
into the shared Jaccard pair pipeline (~2.5 s, also paid by
``dedup_ngram_jaccard``) and the CC fixed-point loop (~2 s), so the
loop is the half this module attacks.  Three changes vs the r8 kernel,
none of which alter the result (property-tested against the same
union-find reference):

1. **Fused convergence probe.**  The r8 loop runs THREE shuffle joins
   per round: neighbor-min, pointer-jump, and a labels-vs-previous
   join just to ask "did anything change?".  Here the previous label
   rides along as ``_plbl`` through the round's two joins and the
   changed flag is computed in the same projection, so the probe is a
   filter-limit-count over the round's already-materialized
   localCheckpoint — no third join, no extra shuffle, and the count
   doubles as the next round's frontier size.

2. **Frontier (delta) propagation.**  Min-label propagation only needs
   to push labels that CHANGED last round: if neighbor u's label is
   unchanged since v last folded it in, ``lbl(v) <= lbl(u)`` already
   holds (labels are monotone non-increasing), and any label that
   decreases — via the neighbor fold OR the pointer jump — lands in
   the next frontier, so its neighbors re-fold it next round.  An
   empty frontier is therefore exactly the fixed point: every edge is
   label-consistent in both directions, so labels are constant per
   component, and since every label is a node id of its own component
   (bounded below by the component minimum, which keeps its own id),
   that constant is the component min.  The neighbor-min join — the
   loop's dominant shuffle — shrinks with the frontier instead of
   re-shuffling every matched doc every round; at 100 TB the frontier
   after round 2 is a tiny fraction of the matched set (most near-dup
   components are pairs/triangles that settle in one round).

3. **Pointer jumping retained.**  ``lbl <- label(lbl)`` still doubles
   effective label distance per round, so long chains converge in
   O(log diameter) rounds — the large-star/small-star bound — with the
   same 20-round safety valve that RAISES rather than returning split
   clusters.

The registered ``dedup_cluster_assign_delta`` query is the driver-
oracle harness for the kernel (same recursive-CTE true-closure oracle
as ``dedup_cluster_assign``); the interleaved A/B against the r8
kernel is recorded in BENCHLOG round-11.  Reference parity: the same
near-dup clustering contract as ``dedup_cluster_assign``
(SURVEY §2.K1; reference `sql/init-db.sql` models dedup state only —
the clustering layer is specified, not implemented, in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from .dedup import _CC_MAX_ROUNDS, _cluster_oracle, _jaccard_edges


def connected_components_delta(pairs: DataFrame,
                               max_rounds: int = _CC_MAX_ROUNDS,
                               ) -> DataFrame:
    """(doc_a, doc_b) undirected pairs -> (doc_id, lbl) with lbl = min
    id in the node's component.  Frontier-restricted min-label
    propagation with pointer jumping and a fused convergence probe —
    see the module docstring for the exactness argument.  Returns the
    same frame as ``dedup.connected_components`` on every input
    (property-tested side by side in tests/test_corpus_ops.py)."""
    sym = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b"))
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # materialize the edge set once; everything below derives from it
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("lbl", F.col("doc_id"))
        .withColumn("_changed", F.lit(True))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        frontier = labels.filter("_changed").select(
            F.col("doc_id").alias("src"), "lbl")
        # neighbor fold over FRONTIER edges only (delta propagation)
        nbr = (
            sym.join(frontier, "src")
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lbl").alias("_nlbl"))
        )
        folded = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.col("lbl").alias("_plbl"),
            F.least("lbl", F.coalesce("_nlbl", F.col("lbl"))).alias("lbl"),
        )
        # pointer jump: lbl <- label(lbl); the invariant lbl <= doc_id
        # makes the jumped label always <= the current one.  _plbl rides
        # along so the changed flag needs no third join.
        jump = folded.select(F.col("doc_id").alias("lbl"),
                             F.col("lbl").alias("_jlbl"))
        labels = (
            folded.join(jump, "lbl", "left")
            .select(
                "doc_id",
                F.coalesce("_jlbl", F.col("lbl")).alias("lbl"),
                (F.coalesce("_jlbl", F.col("lbl")) < F.col("_plbl"))
                .alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        # fused probe: one narrow count over the in-memory checkpoint
        if labels.filter("_changed").limit(1).count() == 0:
            return labels.select("doc_id", "lbl")
    raise RuntimeError(
        f"connected_components_delta did not converge in {max_rounds} "
        f"rounds (component diameter > 2^{max_rounds}); refusing to "
        "return split clusters"
    )


@register(
    "dedup_cluster_assign_delta",
    oracle=_cluster_oracle(),
    survey_ids=["K1"],
    doc="Near-dup cluster assignment on the delta-iteration CC kernel "
        "(VERDICT r10 task 3): same contract and same recursive-CTE "
        "true-closure oracle as dedup_cluster_assign, with the "
        "fixed-point loop rewritten as frontier-restricted min-label "
        "propagation — the per-round neighbor-min shuffle runs over "
        "last round's CHANGED labels only and the convergence probe is "
        "fused into the round's projection instead of costing its own "
        "labels-vs-previous shuffle join. Two shuffle joins + one "
        "narrow count per round vs three joins + a count; the dominant "
        "join shrinks with the frontier. Exactness argument and the "
        "interleaved A/B vs the r8 kernel: module docstring + BENCHLOG "
        "round-11.",
)
def dedup_cluster_assign_delta(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    e = _jaccard_edges(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components_delta(e)
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "lbl").select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
    )
