"""Randomized ANN lifecycle interleaving battery (VERDICT r11 stretch
#9).  The index's three mutators (stream ingest with crash-window
replays, ivf_rebalance, ivf_delete) each have per-op crash tests; this
fuzz drives seeded RANDOM sequences of them against one index and
asserts after every step that the index equals a reference model:

  * the live id set == the model's (no loss, no duplication,
    no resurrection outside the documented replay hazard);
  * full-nprobe ivf_search == brute-force cosine top-k over the model
    (the index's layout invariant survives any interleaving).

Model semantics mirror the documented contracts exactly:
  ingest(batch, e)   adds the batch (epoch guard: e > last_epoch);
  crash+replay(e)    sidecar rolled back then the SAME batch re-fed —
                     dynamic overwrite rewrites its (cell, epoch)
                     partitions, so every batch row is live again
                     (including rows a delete erased in between: the
                     documented re-run-the-erasure hazard);
  delete(ids)        removes ids everywhere;
  rebalance          layout-only (vector multiset unchanged);
  compact            layout-only (stream folded into base; pre-compact
                     epochs are no longer replayable — the documented
                     stop-cleanly contract);
  add(batch)         base-area append.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W, functions as F

from debezium_nats_cdc_spark.operators.ann_index import (
    _vector_scan,
    ivf_add,
    ivf_build,
    ivf_compact,
    ivf_delete,
    ivf_rebalance,
    ivf_search,
)
from debezium_nats_cdc_spark.operators.similarity import _pair_cos, _with_norm
from debezium_nats_cdc_spark.streaming.ann_ingest import IvfStreamIngest

DIM, K = 8, 4


def _vecs(rng: random.Random, ids):
    """Deterministic pseudo-embeddings: two angular clusters so splits
    and probes have structure to find."""
    rows = []
    for i in ids:
        base = [10.0] * DIM if i % 2 == 0 else [-10.0] * (DIM // 2) + [10.0] * (DIM - DIM // 2)
        rows.append((i, [b + 0.1 * rng.uniform(-1, 1) for b in base]))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _brute_topk(spark, model: dict, queries: list[int]):
    corpus = _with_norm(_df(spark, [(i, e) for i, e in model.items()]))
    q = _with_norm(_df(spark, [(i, model[i]) for i in queries])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"), F.col("_norm").alias("q_norm"))
    cos = F.round(_pair_cos(F.col("q_emb"), F.col("embedding"),
                            F.col("q_norm"), F.col("_norm")), 6) \
        .cast("decimal(10,6)")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                          F.asc("neighbor_id"))
    return sorted(map(tuple, (
        corpus.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cos.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= K)
        .withColumn("rnk", F.col("rnk").cast("int"))
        .withColumn("cos_sim", F.col("cos_sim").cast("double"))
    ).collect()))


def _check(spark, d, model: dict, n_cells: int):
    got_ids = sorted(r.vec_id for r in
                     _vector_scan(spark, d).select("vec_id").collect())
    assert got_ids == sorted(model), (
        f"live ids diverge from model: extra={set(got_ids) - set(model)} "
        f"missing={set(model) - set(got_ids)}")
    if not model:
        return
    queries = sorted(model)[:3]
    full = sorted(map(tuple, ivf_search(
        spark, d, _df(spark, [(i, model[i]) for i in queries]),
        k=K, nprobe=n_cells).collect()))
    assert full == _brute_topk(spark, model, queries)


@pytest.mark.parametrize("seed", [11, 23])
def test_random_lifecycle_interleaving(spark, tmp_path, seed):
    rng = random.Random(seed)
    d = str(tmp_path / "ivf")
    next_id = 100
    base_ids = list(range(40))
    base_rows = _vecs(rng, base_ids)
    ivf_build(spark, _df(spark, base_rows), d, n_cells=4)
    model = dict(base_rows)
    n_cells = 4
    ing = IvfStreamIngest(d)
    epoch = -1
    last_batch: list | None = None  # rows of the replayable epoch

    ops = ["ingest", "ingest_crash_replay", "delete", "rebalance", "add",
           "compact"]
    for step in range(8):
        op = rng.choice(ops)
        if op == "ingest":
            rows = _vecs(rng, range(next_id, next_id + rng.randint(3, 8)))
            next_id += len(rows)
            epoch += 1
            ing.process_batch(spark, _df(spark, rows), epoch_id=epoch)
            model.update(dict(rows))
            last_batch = rows
        elif op == "ingest_crash_replay":
            # crash between data write and sidecar update: write epoch
            # e, roll the sidecar back, then re-deliver the SAME batch
            rows = _vecs(rng, range(next_id, next_id + rng.randint(3, 8)))
            next_id += len(rows)
            epoch += 1
            ing.process_batch(spark, _df(spark, rows), epoch_id=epoch)
            ing._write_sidecar({"generation": ing.generation(),
                                "last_epoch": epoch - 1})
            ing.process_batch(spark, _df(spark, rows), epoch_id=epoch)
            model.update(dict(rows))
            last_batch = rows
        elif op == "delete":
            if not model:
                continue
            victims = rng.sample(sorted(model), min(len(model),
                                                    rng.randint(1, 6)))
            rep = ivf_delete(spark, d, victims)
            assert rep["deleted"] == len(victims)
            for v in victims:
                model.pop(v)
        elif op == "rebalance":
            rep = ivf_rebalance(spark, d, max_balance_ratio=1.5)
            n_cells = rep["n_cells"]
            if rep["split_cells"] and last_batch is not None:
                # the documented ingest-replay-after-rebalance window:
                # sidecar rolled back across the swap, the old epoch
                # re-delivered against the NEW centroids
                ing2 = IvfStreamIngest(d)
                ing2._write_sidecar({"generation": ing2.generation(),
                                     "last_epoch": epoch - 1})
                ing2.process_batch(spark, _df(spark, last_batch),
                                   epoch_id=epoch)
                model.update(dict(last_batch))  # re-run hazard: rows live
        elif op == "compact":
            ivf_compact(spark, d)
            # pre-compact epochs are out of replay scope (the documented
            # stop-cleanly contract) and the ingest handle must be
            # re-opened to see the bumped generation
            last_batch = None
            ing = IvfStreamIngest(d)
        else:  # add
            rows = _vecs(rng, range(next_id, next_id + rng.randint(2, 5)))
            next_id += len(rows)
            ivf_add(spark, d, _df(spark, rows))
            model.update(dict(rows))
        _check(spark, d, model, n_cells)


def test_delete_after_replay_converges(spark, tmp_path):
    """The documented erasure re-run contract, end to end: a replay
    resurrects erased rows from its epoch; RE-RUNNING the erasure (the
    documented operator action) converges, and nothing else is lost."""
    rng = random.Random(7)
    d = str(tmp_path / "ivf")
    rows = _vecs(rng, range(30))
    ivf_build(spark, _df(spark, rows), d, n_cells=4)
    ing = IvfStreamIngest(d)
    streamed = _vecs(rng, range(100, 110))
    ing.process_batch(spark, _df(spark, streamed), epoch_id=0)
    model = dict(rows) | dict(streamed)

    victims = [100, 101, 5]
    ivf_delete(spark, d, victims)
    for v in victims:
        model.pop(v)
    # crash-window replay of epoch 0 resurrects its erased rows
    ing._write_sidecar({"generation": ing.generation(), "last_epoch": -1})
    ing.process_batch(spark, _df(spark, streamed), epoch_id=0)
    model.update({i: e for i, e in streamed if i in (100, 101)})
    _check(spark, d, model, 4)
    # the documented remedy: re-run the erasure — converges
    ivf_delete(spark, d, victims)
    for v in (100, 101):
        model.pop(v)
    _check(spark, d, model, 4)
