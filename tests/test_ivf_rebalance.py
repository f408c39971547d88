"""ivf_rebalance (operators/ann_index.py): fat-cell split preserves the
vector set and full-probe exactness, reduces skew, survives a torn
swap, keeps the stream area replay-consistent, and is deterministic.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Window as W, functions as F

from debezium_nats_cdc_spark.operators.ann_index import (
    _load_meta,
    _vector_scan,
    ivf_build,
    ivf_cell_stats,
    ivf_rebalance,
    ivf_search,
)
from debezium_nats_cdc_spark.operators.similarity import _pair_cos, _with_norm
from debezium_nats_cdc_spark.streaming.ann_ingest import IvfStreamIngest

K = 5


def _cluster(spark, ids, sign_flip: bool, dim=8):
    """Tight angular cluster: all-positive direction, or half-negative
    (cosine-far) when sign_flip — the two are angularly separated, which
    is what the index's cosine assignment keys on."""
    import numpy as np

    rng = np.random.RandomState(1107 + int(sign_flip))
    base = np.concatenate([np.full(dim // 2, -10.0), np.full(dim - dim // 2, 10.0)]) \
        if sign_flip else np.full(dim, 10.0)
    rows = [(i, [float(x) for x in base + 0.1 * rng.randn(dim)])
            for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cluster_a(spark):
    return _cluster(spark, range(0, 60), sign_flip=False)


def _cluster_b(spark):
    return _cluster(spark, range(60, 240), sign_flip=True)


def _all_vectors(spark):
    return _cluster_a(spark).unionByName(_cluster_b(spark))


def _queries(spark):
    return _all_vectors(spark).filter(
        (F.col("vec_id") < 3) | (F.col("vec_id").between(60, 62)))


def _brute_topk(spark, corpus, k=K):
    e = _with_norm(corpus)
    q = _with_norm(_queries(spark)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"), F.col("_norm").alias("q_norm"))
    cos = F.round(_pair_cos(F.col("q_emb"), F.col("embedding"),
                            F.col("q_norm"), F.col("_norm")), 6) \
        .cast("decimal(10,6)")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                          F.asc("neighbor_id"))
    return sorted(map(tuple, (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cos.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
    ).collect()))


def _build_skewed(spark, d):
    """The production drift scenario: build on cluster A's distribution
    (4 cells across A), then batch-add cluster B — the frozen centroids
    funnel ALL of B (75% of the corpus) into its single nearest cell:
    balance_ratio 0.75 x 4 = 3."""
    from debezium_nats_cdc_spark.operators.ann_index import ivf_add

    ivf_build(spark, _cluster_a(spark), d, n_cells=4)
    ivf_add(spark, d, _cluster_b(spark))


def test_rebalance_reduces_skew_preserves_vectors_and_exactness(
        spark, tmp_path):
    d = str(tmp_path / "ivf")
    _build_skewed(spark, d)
    pre = {r["cell_id"]: r["balance_ratio"]
           for r in ivf_cell_stats(spark, d).collect()}
    pre_ids = sorted(r.vec_id for r in
                     _vector_scan(spark, d).select("vec_id").collect())
    assert max(pre.values()) > 2.0, "fixture failed to skew"

    pre_share = {r["cell_id"]: r["share"]
                 for r in ivf_cell_stats(spark, d).collect()}
    rep = ivf_rebalance(spark, d, max_balance_ratio=2.0)
    assert rep["split_cells"], rep
    assert rep["n_cells"] == _load_meta(d)["n_cells"]
    # share (corpus fraction a probe of the heaviest cell pays) is the
    # cross-layout skew metric; balance_ratio scales with n_cells
    assert rep["max_share"] < max(pre_share.values())
    post_ids = sorted(r.vec_id for r in
                      _vector_scan(spark, d).select("vec_id").collect())
    assert post_ids == pre_ids  # no vector lost or duplicated
    # full probe == brute force still holds on the rebalanced layout
    full = sorted(map(tuple, ivf_search(
        spark, d, _queries(spark), k=K,
        nprobe=rep["n_cells"]).collect()))
    assert full == _brute_topk(spark, _all_vectors(spark))


def test_rebalance_noop_below_threshold_and_deterministic(spark, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (d1, d2):
        _build_skewed(spark, d)
        ivf_rebalance(spark, d, max_balance_ratio=2.0)
    # identical inputs -> identical rebalanced centroids + assignments
    c1 = sorted(map(tuple, _vector_scan(spark, d1)
                    .select("vec_id", "cell_id").collect()))
    c2 = sorted(map(tuple, _vector_scan(spark, d2)
                    .select("vec_id", "cell_id").collect()))
    assert c1 == c2
    rep = ivf_rebalance(spark, d1, max_balance_ratio=99.0)
    assert rep["split_cells"] == []  # nothing over threshold: no-op


def test_torn_swap_recovers_to_a_complete_index(spark, tmp_path):
    d = str(tmp_path / "ivf")
    _build_skewed(spark, d)
    before = sorted(map(tuple, ivf_search(
        spark, d, _queries(spark), k=K, nprobe=4).collect()))
    # simulate the crash window between the two renames
    os.rename(d, d + ".old")
    os.makedirs(d + ".rebalancing")
    from debezium_nats_cdc_spark.operators.ann_index import _recover_swap

    _recover_swap(d)
    assert os.path.isdir(d) and not os.path.isdir(d + ".old")
    assert not os.path.isdir(d + ".rebalancing")
    after = sorted(map(tuple, ivf_search(
        spark, d, _queries(spark), k=K, nprobe=4).collect()))
    assert after == before


def test_stream_area_rewritten_and_replay_consistent(spark, tmp_path):
    """Stream-ingested vectors survive the rebalance (re-assigned into
    child cells, same epochs), and a crash-window REPLAY of an old
    epoch against the rebalanced index leaves the index unchanged."""
    d = str(tmp_path / "ivf")
    vecs = _all_vectors(spark)
    ivf_build(spark, _cluster_a(spark), d, n_cells=4)
    ing = IvfStreamIngest(d)
    streamed = _cluster_b(spark)
    ing.process_batch(spark, streamed, epoch_id=0)

    rep = ivf_rebalance(spark, d, max_balance_ratio=2.0)
    assert rep["split_cells"]
    got = sorted(r.vec_id for r in
                 _vector_scan(spark, d).select("vec_id").collect())
    assert got == sorted(r.vec_id for r in vecs.collect())
    snap = sorted(map(tuple, ivf_search(
        spark, d, _queries(spark), k=K, nprobe=rep["n_cells"]).collect()))

    # crash-window replay: sidecar rolled back, epoch 0 re-delivered —
    # re-assignment runs against the NEW centroids and dynamic
    # overwrite rewrites exactly the child partitions the rebalance made
    ing2 = IvfStreamIngest(d)
    ing2._write_sidecar({"generation": ing2.generation(), "last_epoch": -1})
    ing2.process_batch(spark, streamed, epoch_id=0)
    assert sorted(r.vec_id for r in
                  _vector_scan(spark, d).select("vec_id").collect()) == got
    assert sorted(map(tuple, ivf_search(
        spark, d, _queries(spark), k=K,
        nprobe=rep["n_cells"]).collect())) == snap

def test_concurrent_reader_leaves_claimed_staging_alone(spark, tmp_path):
    """ADVICE r11 (medium): _recover_swap used to rmtree the staging
    tree on EVERY _load_meta — a concurrent ivf_search/ivf_cell_stats
    during a live rebalance could delete the half-built index.  Now a
    staging dir claimed by the builder's _rebalance.lock marker
    survives reads; an UNCLAIMED one (pre-claim crash debris) is still
    swept, and genuine torn-swap healing still clears everything."""
    from debezium_nats_cdc_spark.operators.ann_index import (
        _REBALANCE_MARKER, _recover_swap)

    d = str(tmp_path / "ivf")
    _build_skewed(spark, d)
    staging = d + ".rebalancing"

    # claimed staging (mid-build state): reads must leave it intact
    import json as _json
    with open(os.path.join(d, _REBALANCE_MARKER), "w") as f:
        f.write(_json.dumps({"pid": 0}))
    os.makedirs(os.path.join(staging, "centroids"))
    ivf_cell_stats(spark, d).collect()          # a concurrent reader
    ivf_search(spark, d, _queries(spark), k=K, nprobe=4).collect()
    assert os.path.isdir(staging), "reader deleted a claimed staging dir"

    # unclaimed staging: swept as before
    os.remove(os.path.join(d, _REBALANCE_MARKER))
    _recover_swap(d)
    assert not os.path.isdir(staging)

    # torn swap + stale claim: healing restores the live dir and clears
    # both the staging tree and the dead builder's marker
    os.makedirs(os.path.join(staging, "centroids"))
    with open(os.path.join(d, _REBALANCE_MARKER), "w") as f:
        f.write(_json.dumps({"pid": 0}))
    os.rename(d, d + ".old")
    _recover_swap(d)
    assert os.path.isdir(d) and not os.path.isdir(d + ".old")
    assert not os.path.isdir(staging)
    assert not os.path.exists(os.path.join(d, _REBALANCE_MARKER))
    # index is complete and serves
    ivf_search(spark, d, _queries(spark), k=K, nprobe=4).collect()


def test_completed_rebalance_drops_its_claim(spark, tmp_path):
    """A successful rebalance leaves no marker and no staging dir —
    the claim dies with the swap, so later _recover_swap runs behave
    exactly as before the ADVICE fix."""
    from debezium_nats_cdc_spark.operators.ann_index import _REBALANCE_MARKER

    d = str(tmp_path / "ivf")
    _build_skewed(spark, d)
    rep = ivf_rebalance(spark, d, max_balance_ratio=2.0)
    assert rep["split_cells"]
    assert not os.path.exists(os.path.join(d, _REBALANCE_MARKER))
    assert not os.path.isdir(d + ".rebalancing")
    assert not os.path.isdir(d + ".old")


def test_maybe_rebalance_policy(spark, tmp_path):
    """OPERATIONS.md §11 skew trigger as code (r13, the maybe_compact
    twin): fires above max_balance_ratio, skips below, refuses while
    the rebalance lock is claimed."""
    import json

    from debezium_nats_cdc_spark.operators.ann_index import (
        _REBALANCE_MARKER,
        maybe_rebalance,
    )

    d = str(tmp_path / "ivf")
    # n_cells=2 with two angularly-separated clusters of 60 vs 180
    # vectors: the fat cell's balance_ratio is 180/240 x 2 = 1.5
    ivf_build(spark, _all_vectors(spark), d, n_cells=2)
    observed = ivf_cell_stats(spark, d).first()["balance_ratio"]
    assert observed > 1.0

    # below threshold: poll reports the observed ratio, runs nothing
    rep = maybe_rebalance(spark, d, max_balance_ratio=observed + 0.1)
    assert rep == {"ran": False, "reason": "below-threshold",
                   "max_balance_ratio": observed,
                   "threshold": observed + 0.1}

    # lock held: skipped even though the threshold would fire
    marker = os.path.join(d, _REBALANCE_MARKER)
    with open(marker, "w") as f:
        json.dump({"pid": 0}, f)
    rep = maybe_rebalance(spark, d, max_balance_ratio=observed - 0.1)
    assert rep["ran"] is False and rep["reason"] == "rebalance-lock-held"
    os.remove(marker)

    # above threshold: the rebalance runs and reduces the hot share
    rep = maybe_rebalance(spark, d, max_balance_ratio=observed - 0.1)
    assert rep["ran"] is True and rep["reason"] == "cell-skew"
    assert rep["max_balance_ratio"] == observed
    post = ivf_cell_stats(spark, d).first()
    assert post["share"] < observed / 2  # ratio is share x n_cells(=2)
    assert _load_meta(d)["n_cells"] > 2
