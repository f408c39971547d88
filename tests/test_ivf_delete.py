"""ivf_delete (operators/ann_index.py): the erasure cascade's ANN leg —
targeted cell rewrite, erased ids unreachable by search, untouched
cells byte-untouched, fully-emptied partitions removed, idempotent
re-run, stream area covered.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.io import load_table
from debezium_nats_cdc_spark.operators.ann_index import (
    _vector_scan,
    ivf_build,
    ivf_delete,
    ivf_search,
)
from debezium_nats_cdc_spark.streaming.ann_ingest import IvfStreamIngest

SF = "/root/testdata/sf0.001"
N_CELLS, K = 8, 5


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def _queries(spark):
    return _emb(spark).filter(F.col("vec_id") < 8)


def _search(spark, d, nprobe=N_CELLS):
    return sorted(map(tuple, ivf_search(
        spark, d, _queries(spark), k=K, nprobe=nprobe).collect()))


def _mtimes(d):
    out = {}
    for root, _, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.path.getmtime(p)
    return out


def test_delete_erases_ids_and_touches_only_hit_cells(spark, tmp_path):
    d = str(tmp_path / "ivf")
    ivf_build(spark, _emb(spark), d, n_cells=N_CELLS)
    victims = [r.vec_id for r in
               _vector_scan(spark, d).select("vec_id", "cell_id")
               .filter(F.col("cell_id").cast("int") == 1)
               .limit(3).collect()]
    untouched_before = {
        p: t for p, t in _mtimes(os.path.join(d, "vectors")).items()
        if "cell_id=1/" not in p}
    pre_ids = set(r.vec_id for r in
                  _vector_scan(spark, d).select("vec_id").collect())

    rep = ivf_delete(spark, d, victims)
    assert rep["deleted"] == len(victims)
    assert rep["cells_rewritten"] == [1]
    post_ids = set(r.vec_id for r in
                   _vector_scan(spark, d).select("vec_id").collect())
    assert post_ids == pre_ids - set(victims)
    # erased ids never come back from search, everything else unchanged
    hits = {t[1] for t in _search(spark, d)}
    assert not hits & set(victims)
    # cells without a hit were not rewritten (file mtimes identical)
    untouched_after = {
        p: t for p, t in _mtimes(os.path.join(d, "vectors")).items()
        if "cell_id=1/" not in p}
    assert untouched_after == untouched_before

    rep2 = ivf_delete(spark, d, victims)  # idempotent re-run
    assert rep2["deleted"] == 0
    assert set(r.vec_id for r in
               _vector_scan(spark, d).select("vec_id").collect()) == post_ids


def test_delete_removes_fully_emptied_partitions(spark, tmp_path):
    d = str(tmp_path / "ivf")
    ivf_build(spark, _emb(spark), d, n_cells=N_CELLS)
    cell3 = [r.vec_id for r in
             _vector_scan(spark, d).select("vec_id", "cell_id")
             .filter(F.col("cell_id").cast("int") == 3).collect()]
    rep = ivf_delete(spark, d, cell3)
    assert rep["deleted"] == len(cell3)
    assert rep["partitions_removed"] >= 1
    assert not os.path.isdir(os.path.join(d, "vectors", "cell_id=3"))
    remaining = set(r.vec_id for r in
                    _vector_scan(spark, d).select("vec_id").collect())
    assert not remaining & set(cell3)


def test_delete_reaches_the_stream_area(spark, tmp_path):
    d = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_build(spark, e.filter(F.col("vec_id") % 2 == 0), d, n_cells=N_CELLS)
    ing = IvfStreamIngest(d)
    ing.process_batch(spark, e.filter(F.col("vec_id") % 2 == 1), epoch_id=0)
    victims = [1, 2, 3]  # one streamed (odd) + two base (even) ids
    rep = ivf_delete(spark, d, victims)
    assert rep["deleted"] == 3
    remaining = set(r.vec_id for r in
                    _vector_scan(spark, d).select("vec_id").collect())
    assert not remaining & set(victims)
    hits = {t[1] for t in _search(spark, d)}
    assert not hits & set(victims)

def test_delete_every_vector_leaves_a_readable_empty_index(spark, tmp_path):
    """ADVICE r11: an erasure batch that empties EVERY partition must not
    leave a schema-less directory behind — the index stays readable
    (zero rows), searchable (zero hits), and a later ivf_add restores
    the partitioned layout and makes the index live again."""
    d = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_build(spark, e.filter(F.col("vec_id") % 2 == 0), d, n_cells=N_CELLS)
    ing = IvfStreamIngest(d)
    ing.process_batch(spark, e.filter(F.col("vec_id") % 2 == 1), epoch_id=0)
    everyone = [r.vec_id for r in
                _vector_scan(spark, d).select("vec_id").collect()]
    rep = ivf_delete(spark, d, everyone)
    assert rep["deleted"] == len(everyone)
    # readable and empty — both the scan and a full-nprobe search
    assert _vector_scan(spark, d).count() == 0
    assert _search(spark, d) == []
    # idempotent re-run on the emptied index
    assert ivf_delete(spark, d, everyone)["deleted"] == 0
    # ivf_add restores the partitioned layout and the index serves again
    from debezium_nats_cdc_spark.operators.ann_index import ivf_add

    ivf_add(spark, d, e.filter(F.col("vec_id") < 40))
    area = os.path.join(d, "vectors")
    assert any(n.startswith("cell_id=") for n in os.listdir(area))
    # no stray flat data file beside the partition dirs (layout conflict)
    assert not any(n.endswith(".parquet") for n in os.listdir(area))
    assert _vector_scan(spark, d).count() == 40
    assert len(_search(spark, d)) > 0


def test_delete_mismatched_id_type_casts_or_raises(spark, tmp_path):
    """ADVICE r11: a DataFrame of ids whose type differs from the
    index's vec_id must not silently delete 0 rows.  Losslessly
    castable ids (int, numeric strings) work; non-castable ids raise."""
    import pytest

    d = str(tmp_path / "ivf")
    ivf_build(spark, _emb(spark), d, n_cells=N_CELLS)
    pre = _vector_scan(spark, d).count()
    # string ids that cast losslessly to bigint: the erasure proceeds
    ids_str = spark.createDataFrame([("1",), ("2",)], "vec_id string")
    rep = ivf_delete(spark, d, ids_str)
    assert rep["deleted"] == 2
    assert _vector_scan(spark, d).count() == pre - 2
    # an id that cannot cast raises loudly instead of skipping it
    bad = spark.createDataFrame([("3",), ("user-00004",)], "vec_id string")
    with pytest.raises(ValueError, match="do not cast"):
        ivf_delete(spark, d, bad)
    assert _vector_scan(spark, d).count() == pre - 2  # nothing erased


def test_delete_raises_when_partition_removal_fails(
        spark, tmp_path, monkeypatch):
    """r15 (the ivf_refresh_pq dead-cell discipline): a swallowed
    removal failure must RAISE, not report PII rows as deleted while
    their partition stays readable on disk.  Idempotent — the re-run
    with working removal converges."""
    import shutil

    import pytest

    d = str(tmp_path / "ivf")
    ivf_build(spark, _emb(spark), d, n_cells=N_CELLS)
    cell3 = [r.vec_id for r in
             _vector_scan(spark, d).select("vec_id", "cell_id")
             .filter(F.col("cell_id").cast("int") == 3).collect()]
    real_rmtree = shutil.rmtree
    monkeypatch.setattr(shutil, "rmtree", lambda *a, **k: None)
    with pytest.raises(ValueError, match="erasure incomplete"):
        ivf_delete(spark, d, cell3)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    rep = ivf_delete(spark, d, cell3)  # re-run converges
    assert not os.path.isdir(os.path.join(d, "vectors", "cell_id=3"))
    remaining = set(r.vec_id for r in
                    _vector_scan(spark, d).select("vec_id").collect())
    assert not remaining & set(cell3)
