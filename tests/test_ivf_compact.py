"""ivf_compact (operators/ann_index.py): folding the stream area into
the base preserves the vector set, assignments, and full-probe
exactness; reduces the file count it exists to bound; leaves a resumed
ingest's epoch guard intact (redelivery no-ops, new epochs land); and
no-ops without a stream area.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.io import load_table
from debezium_nats_cdc_spark.operators.ann_index import (
    _STREAM_SUBDIR,
    _vector_scan,
    ivf_build,
    ivf_compact,
    ivf_search,
)
from debezium_nats_cdc_spark.streaming.ann_ingest import IvfStreamIngest

SF = "/root/testdata/sf0.001"
N_CELLS, K = 8, 5


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def _search(spark, d):
    return sorted(map(tuple, ivf_search(
        spark, d, _emb(spark).filter(F.col("vec_id") < 8),
        k=K, nprobe=N_CELLS).collect()))


def _parquet_files(root):
    return sum(1 for r, _, fs in os.walk(root)
               for f in fs if f.endswith(".parquet"))


def test_compact_folds_stream_into_base_and_cuts_files(spark, tmp_path):
    d = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_build(spark, e.filter(F.col("vec_id") % 2 == 0), d, n_cells=N_CELLS)
    ing = IvfStreamIngest(d)
    odd = e.filter(F.col("vec_id") % 2 == 1)
    for b in range(3):  # 3 epochs: file count accumulates per (cell, epoch)
        ing.process_batch(spark, odd.filter(F.col("vec_id") % 6 == 2 * b + 1),
                          epoch_id=b)
    pre_ids = sorted(r.vec_id for r in
                     _vector_scan(spark, d).select("vec_id").collect())
    pre_search = _search(spark, d)
    pre_files = _parquet_files(d)
    pre_assign = sorted(map(tuple, _vector_scan(spark, d)
                            .select("vec_id", "cell_id").collect()))

    rep = ivf_compact(spark, d)
    assert rep["compacted"] > 0 and rep["n_cells"] == N_CELLS
    assert not os.path.isdir(os.path.join(d, _STREAM_SUBDIR))
    assert sorted(r.vec_id for r in
                  _vector_scan(spark, d).select("vec_id").collect()) == pre_ids
    # assignments verbatim — nothing numeric recomputed
    assert sorted(map(tuple, _vector_scan(spark, d)
                      .select("vec_id", "cell_id").collect())) == pre_assign
    assert _search(spark, d) == pre_search
    assert _parquet_files(d) < pre_files
    # idempotent second run: no stream area -> no-op
    assert ivf_compact(spark, d) == {"compacted": 0, "n_cells": N_CELLS}


def test_compact_preserves_epoch_guard_and_accepts_new_epochs(spark, tmp_path):
    d = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_build(spark, e.filter(F.col("vec_id") % 2 == 0), d, n_cells=N_CELLS)
    ing = IvfStreamIngest(d)
    batch0 = e.filter(F.col("vec_id") % 4 == 1)
    ing.process_batch(spark, batch0, epoch_id=0)
    gen_before = ing.generation()

    rep = ivf_compact(spark, d)
    assert rep["compacted"] > 0
    ing2 = IvfStreamIngest(d)
    assert ing2.generation() == gen_before + 1  # no lineage collision
    assert ing2.last_epoch() == 0               # guard preserved
    snap = sorted(r.vec_id for r in
                  _vector_scan(spark, d).select("vec_id").collect())
    # engine-level redelivery of the last committed batch: no-ops on
    # the preserved guard instead of duplicating rows now in the base
    ing2.process_batch(spark, batch0, epoch_id=0)
    assert sorted(r.vec_id for r in
                  _vector_scan(spark, d).select("vec_id").collect()) == snap
    # a genuinely new epoch lands and is searchable
    batch1 = e.filter(F.col("vec_id") % 4 == 3)
    ing2.process_batch(spark, batch1, epoch_id=1)
    got = set(r.vec_id for r in
              _vector_scan(spark, d).select("vec_id").collect())
    assert set(r.vec_id for r in batch1.select("vec_id").collect()) <= got


def test_maybe_compact_policy(spark, tmp_path):
    """OPERATIONS.md §11 file-count trigger as code (r13): fires above
    files_per_cell x n_cells, skips below, and refuses while the
    rebalance lock is claimed."""
    import json

    from debezium_nats_cdc_spark.operators.ann_index import (
        _REBALANCE_MARKER,
        maybe_compact,
    )

    d = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_build(spark, e.filter(F.col("vec_id") % 2 == 0), d, n_cells=N_CELLS)
    ing = IvfStreamIngest(d)
    odd = e.filter(F.col("vec_id") % 2 == 1)
    for b in range(2):
        ing.process_batch(spark, odd.filter(F.col("vec_id") % 4 == 2 * b + 1),
                          epoch_id=b)
    stream_files = _parquet_files(os.path.join(d, _STREAM_SUBDIR))
    assert stream_files > 0

    # below threshold: trigger reports the count and does nothing
    rep = maybe_compact(spark, d, files_per_cell=stream_files + 1)
    assert rep == {"ran": False, "reason": "below-threshold",
                   "stream_files": stream_files,
                   "threshold": (stream_files + 1) * N_CELLS}
    assert os.path.isdir(os.path.join(d, _STREAM_SUBDIR))

    # lock held: skipped even though the threshold would fire
    marker = os.path.join(d, _REBALANCE_MARKER)
    with open(marker, "w") as f:
        json.dump({"pid": 0}, f)
    rep = maybe_compact(spark, d, files_per_cell=0.0)
    assert rep["ran"] is False and rep["reason"] == "rebalance-lock-held"
    assert os.path.isdir(os.path.join(d, _STREAM_SUBDIR))
    os.remove(marker)

    # above threshold: compaction runs and folds the stream area
    pre_search = _search(spark, d)
    rep = maybe_compact(spark, d, files_per_cell=0.0)
    assert rep["ran"] is True and rep["reason"] == "file-count"
    assert rep["compacted"] > 0 and rep["stream_files"] == stream_files
    assert not os.path.isdir(os.path.join(d, _STREAM_SUBDIR))
    assert _search(spark, d) == pre_search

    # stream area gone: next poll is a cheap below-threshold no-op
    rep = maybe_compact(spark, d, files_per_cell=0.0)
    assert rep == {"ran": False, "reason": "below-threshold",
                   "stream_files": 0, "threshold": 0}
