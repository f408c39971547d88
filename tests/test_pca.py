"""PCA fit/project (operators/linalg.py) vs numpy ground truth.

The distributed piece is the covariance kernel (already oracle-verified
via emb_covariance); these tests pin the driver-side eigensolve + the
map-only projection against numpy computed directly on the same rows.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.operators.linalg import (
    PcaModel,
    pca_fit,
    pca_project,
)


def _df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id bigint, embedding array<double>",
    )


def _numpy_pca(mat, k):
    mat = np.asarray(mat, dtype=float)
    mu = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return mu, comps, evals[order]


def test_pca_matches_numpy(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: variance concentrated along two known axes
    base = rng.normal(size=(200, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    # 6dp-round the data so the engine's DECIMAL canonicalization is a
    # no-op and numpy sees bit-identical inputs
    mat = np.round(base, 6)
    mu_np, comps_np, ev_np = _numpy_pca(mat, k=3)

    model = pca_fit(spark, _df(spark, mat), k=3)

    assert np.allclose(model.mean, mu_np, atol=1e-6)
    # covariance cells are 8dp-rounded before the eigensolve, so allow
    # a loose-but-meaningful tolerance on the eigenstructure
    assert np.allclose(model.explained_variance, ev_np, atol=1e-5)
    for got, want in zip(model.components, comps_np):
        assert np.allclose(got, want, atol=1e-4)
    # orthonormality of the returned basis
    C = np.array(model.components)
    assert np.allclose(C @ C.T, np.eye(3), atol=1e-6)
    # ratio sums to <= 1 and is descending
    r = model.explained_variance_ratio
    assert all(a >= b for a, b in zip(r, r[1:]))
    assert 0.0 < sum(r) <= 1.0 + 1e-9


def test_pca_project_matches_numpy(spark):
    rng = np.random.default_rng(11)
    mat = np.round(rng.normal(size=(50, 4)), 6)
    model = pca_fit(spark, _df(spark, mat), k=2)

    out = (pca_project(_df(spark, mat), model)
           .orderBy("vec_id").select("proj").collect())
    got = np.array([r.proj for r in out])

    mu = np.array(model.mean)
    W = np.array(model.components)
    want = (mat - mu) @ W.T
    assert np.allclose(got, want, atol=1e-9)


def test_pca_project_is_shuffle_free(spark):
    mat = np.eye(3)
    model = pca_fit(spark, _df(spark, np.round(np.random.default_rng(3)
                                               .normal(size=(20, 3)), 6)), k=2)
    plan = (pca_project(_df(spark, mat), model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan  # scan -> project, nothing else


def test_pca_fit_raises_on_ragged_corpus(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0]), (3, [0.5, 1.5, 2.5])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        pca_fit(spark, df, k=2)


def test_pca_fit_raises_on_empty_and_bad_k(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(spark, empty, k=1)
    mat = np.round(np.random.default_rng(5).normal(size=(10, 3)), 6)
    with pytest.raises(ValueError, match="k=9"):
        pca_fit(spark, _df(spark, mat), k=9)


def test_pca_model_roundtrips_through_pickle(spark):
    import pickle
    mat = np.round(np.random.default_rng(9).normal(size=(30, 4)), 6)
    model = pca_fit(spark, _df(spark, mat), k=2)
    clone = pickle.loads(pickle.dumps(model))
    assert clone.mean == model.mean
    assert clone.components == model.components
    assert clone.k == 2 and clone.d == 4


def test_catalog_pca_project_check_matches_numpy(spark, tmp_path):
    """The catalog query (emb_pca_project_check) is the pca_project
    kernel with a literal deterministic basis — pin its values against
    a numpy recomputation of the same fold over the same float32 data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_nats_cdc_spark.operators.linalg import (
        _PCA_COMPS,
        _PCA_D,
        _PCA_MEAN,
        emb_pca_project_check,
    )

    rng = np.random.default_rng(11)
    good = rng.normal(size=(40, _PCA_D)).astype(np.float32)
    embs = [[float(x) for x in row] for row in good]
    # rows the query must EXCLUDE: NULL, empty, short, NULL-lane, NaN-lane
    bad = [None, [], [1.0] * 8,
           [None] + [0.0] * (_PCA_D - 1),
           [float("nan")] + [0.0] * (_PCA_D - 1)]
    all_embs = embs + bad
    pq.write_table(
        pa.table({"vec_id": pa.array(range(len(all_embs)), pa.int64()),
                  "embedding": pa.array(all_embs, pa.list_(pa.float32()))}),
        f"{tmp_path}/embeddings.parquet")

    out = {r.vec_id: (r.proj_0, r.proj_1)
           for r in emb_pca_project_check(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(40))  # every dirty row excluded

    mu = np.array(_PCA_MEAN)
    for i, row in enumerate(good):
        x = row.astype(np.float64)
        for j, comp in enumerate(_PCA_COMPS):
            acc = 0.0
            for t in (x - mu) * np.array(comp):  # the engines' left fold
                acc = acc + t
            expect = round(acc, 6)
            got = float(out[i][j])
            assert abs(got - expect) < 5e-7, (i, j, got, expect)
