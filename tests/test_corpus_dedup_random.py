"""Seeded randomized invariance test for the streaming corpus dedup.

The crafted fixtures in test_corpus_dedup_stream pin exact memberships;
this test feeds RANDOM corpora (duplicate clusters, shared-prefix docs,
shuffled arrival order, random batch boundaries) through the pipeline
and asserts the invariants that must hold for ANY input:

  I1  partition: accepted ∪ quarantined == everything ingested, disjoint
  I2  every quarantined doc's dup_of names an ACCEPTED doc
  I3  keeper monotonicity: dup_of < doc_id (ids arrive in order; a
      keeper is always an earlier arrival)
  I4  exact-dup capture: identical texts share identical minhash
      signatures and always collide in every band, so at most ONE doc
      per distinct text is accepted — regardless of batch boundaries
  I5  the band index holds exactly the accepted ids
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.streaming.corpus_dedup import CorpusDedupPipeline

DOC_SCHEMA = "doc_id long, text string"
_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _corpus(rng, n_docs: int):
    """Random docs with planted exact-dup clusters and near-dup heads."""
    texts = []
    base_pool = [
        " ".join(rng.choice(_WORDS) for _ in range(int(rng.randint(20, 60))))
        for _ in range(max(3, n_docs // 5))
    ]
    for _ in range(n_docs):
        r = rng.rand()
        if r < 0.35:  # exact duplicate of a pool doc
            texts.append(base_pool[int(rng.randint(0, len(base_pool)))])
        elif r < 0.5:  # shared long head, diverging tail
            head = base_pool[int(rng.randint(0, len(base_pool)))]
            texts.append(head + " " +
                         " ".join(rng.choice(_WORDS) for _ in range(5)))
        else:
            texts.append(" ".join(rng.choice(_WORDS)
                                  for _ in range(int(rng.randint(15, 50)))))
    return [(i, t) for i, t in enumerate(texts)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_corpus_invariants(spark, tmp_path, seed):
    rng = np.random.RandomState(seed)
    docs = _corpus(rng, 60)
    cuts = sorted(rng.choice(range(5, 55), size=2, replace=False))
    batches = [docs[:cuts[0]], docs[cuts[0]:cuts[1]], docs[cuts[1]:]]

    pipe = CorpusDedupPipeline(str(tmp_path / "dedup"))
    for i, b in enumerate(batches):
        pipe.process_batch(
            spark, spark.createDataFrame(b, DOC_SCHEMA), epoch_id=i)

    accepted = {r.doc_id for r in
                spark.read.parquet(pipe.accepted_dir).collect()}
    quarantined = {(r.doc_id, r.dup_of) for r in
                   spark.read.parquet(pipe.quarantine_dir).collect()}
    q_ids = {d for d, _ in quarantined}

    all_ids = {i for i, _ in docs}
    assert accepted | q_ids == all_ids          # I1: nothing lost
    assert not (accepted & q_ids)               # I1: nothing in both
    assert {k for _, k in quarantined} <= accepted  # I2
    assert all(k < d for d, k in quarantined)   # I3

    by_text: dict[str, list[int]] = {}
    for i, t in docs:
        by_text.setdefault(t, []).append(i)
    for t, ids in by_text.items():
        n_acc = len([i for i in ids if i in accepted])
        assert n_acc <= 1, (                    # I4
            f"{len(ids)} exact copies, {n_acc} accepted: {ids}")

    idx_ids = {r.doc_id for r in spark.read.parquet(pipe.index_dir)
               .select("doc_id").collect()}
    assert idx_ids == accepted                  # I5


def test_random_corpus_dups_actually_found(spark, tmp_path):
    """Anti-vacuity check for the invariants above: with 35% planted
    exact dups, the pipeline must quarantine a substantial set."""
    rng = np.random.RandomState(7)
    docs = _corpus(rng, 60)
    pipe = CorpusDedupPipeline(str(tmp_path / "dedup"))
    pipe.process_batch(spark, spark.createDataFrame(docs, DOC_SCHEMA),
                       epoch_id=0)
    n_quar = spark.read.parquet(pipe.quarantine_dir).count()
    n_exact_extra = sum(
        c - 1 for c in
        __import__("collections").Counter(t for _, t in docs).values())
    assert n_quar >= n_exact_extra > 0  # every exact extra copy caught


# ------------------------------------------- embedding-dedup twin ----


def test_random_vectors_invariants(spark, tmp_path):
    """Same invariant battery over the streaming EMBEDDING dedup with
    random unit vectors + planted scaled duplicates (cosine exactly 1)
    across random batch boundaries."""
    from pyspark.sql import Row

    from debezium_nats_cdc_spark.streaming.embedding_dedup import (
        EmbeddingDedupPipeline,
    )

    rng = np.random.RandomState(11)
    dim = 64
    base = rng.randn(10, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(50):
        r = rng.rand()
        if r < 0.4:  # scaled copy of a base vector: cosine exactly 1
            v = base[int(rng.randint(0, 10))] * float(rng.uniform(0.5, 2.0))
        else:
            v = rng.randn(dim)
            v /= np.linalg.norm(v)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    cut = int(rng.randint(10, 40))

    pipe = EmbeddingDedupPipeline(str(tmp_path / "emb"))
    from tests.test_embedding_dedup_stream import VEC_SCHEMA

    pipe.process_batch(
        spark, spark.createDataFrame(rows[:cut], VEC_SCHEMA), epoch_id=0)
    pipe.process_batch(
        spark, spark.createDataFrame(rows[cut:], VEC_SCHEMA), epoch_id=1)

    accepted = {r.vec_id for r in
                spark.read.parquet(pipe.accepted_dir).collect()}
    quarantined = {(r.vec_id, r.dup_of) for r in
                   spark.read.parquet(pipe.quarantine_dir).collect()}
    q_ids = {d for d, _ in quarantined}
    assert accepted | q_ids == set(range(50))
    assert not (accepted & q_ids)
    assert {k for _, k in quarantined} <= accepted
    assert all(k < d for d, k in quarantined)
    assert len(q_ids) > 0  # planted scaled dups must be caught
