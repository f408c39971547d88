"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

All of these fold JVM-side with ``aggregate``/``zip_with`` higher-order
functions: no Python UDF, no serialization, whole-stage-codegen eligible.
Accumulation is an explicit left fold in DOUBLE so results are
deterministic (same association order every run — required for the
DuckDB oracle hash match and for reproducible top-k at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as double (left fold, deterministic order)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    # try_divide: a zero-norm (or empty) vector yields SQL NULL instead
    # of an ANSI DIVIDE_BY_ZERO that would kill the stage — one corrupt
    # row must never fail a 100 TB job, and DuckDB's x/0.0 is NULL too,
    # so the oracle twin agrees without special-casing
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def _stack_valid(vals, dim: int):
    """Object array of embedding rows -> (v×dim float64 matrix of the VALID
    rows only, valid mask over the original batch).

    Fast path: one vstack when every row is a well-formed vector (the
    overwhelmingly common case — zero per-row Python work).  Fallback:
    per-row validation.  INVALID = NULL row, ragged/wrong-dimension row,
    or a row containing NaN (Arrow surfaces a NULL *element* of an
    array<float> as NaN, and the Catalyst fold yields NULL for those
    rows) — the caller emits SQL NULL for invalid rows, matching the
    Catalyst/DuckDB paths, instead of the whole Arrow batch (and
    therefore the stage) dying on one corrupt row.
    """
    import numpy as np

    try:
        A = np.vstack(vals).astype(np.float64)
    except (ValueError, TypeError):
        A = None
    if A is not None and A.ndim == 2 and A.shape[1] == dim:
        mask = ~np.isnan(A).any(axis=1)
        return (A if mask.all() else A[mask]), mask
    mask = np.zeros(len(vals), dtype=bool)
    rows = []
    for i, v in enumerate(vals):
        a = _row_valid(v, dim)
        if a is not None:
            mask[i] = True
            rows.append(a)
    M = np.vstack(rows) if rows else np.empty((0, dim), dtype=np.float64)
    return M, mask


def _row_valid(v, dim: int | None):
    """One embedding row -> float64 1-D vector, or None if corrupt
    (NULL, non-numeric, ragged vs ``dim``, empty, or containing NaN)."""
    import numpy as np

    if v is None:
        return None
    try:
        a = np.asarray(v, dtype=np.float64)
    except (ValueError, TypeError):
        return None
    if a.ndim != 1 or a.size == 0 or (dim is not None and a.size != dim):
        return None
    if np.isnan(a).any():
        return None
    return a


def plane_sign_word_arrow(emb: Column | str,
                          planes: list[list[float]]) -> Column:
    """Packed sign word of K hyperplane dot products in ONE Arrow kernel
    (bit i = 1 iff dot(emb, planes[i]) >= 0) — the LSH sketch hot path.

    K Catalyst fold-dots per row are interpreted per element (K=16 at
    64-dim = 1024 lambda evaluations per row; sim_embedding_neardup
    measured 4.3 s at sf0.1 that way).  The kernel loops over DIMENSIONS
    (64 vectorized ops over the whole batch×K matrix), accumulating in
    float64 strictly left-to-right over dims — the SAME association
    order as the Catalyst fold and DuckDB's list_inner_product, so sign
    bits are bit-identical across all three engines (oracle contract;
    a blocked/pairwise matmul would round differently near zero).

    NULL/ragged rows yield SQL NULL (via _stack_valid) — one corrupt
    embedding at 100 TB must not fail the stage; downstream bucket
    equi-joins then drop those rows, exactly as the oracle's NULL
    comparisons do.
    """
    from pyspark.sql.functions import pandas_udf

    rows = [list(map(float, p)) for p in planes]

    @pandas_udf("long")
    def _word(col):
        import numpy as np
        import pandas as pd

        M = np.asarray(rows, dtype=np.float64)            # K × dim
        A, valid = _stack_valid(col.to_numpy(), M.shape[1])
        acc = np.zeros((A.shape[0], M.shape[0]), dtype=np.float64)
        for d in range(A.shape[1]):                       # sequential fold
            acc += A[:, d:d + 1] * M[:, d]
        powers = (1 << np.arange(M.shape[0], dtype=np.int64))
        words = ((acc >= 0) @ powers).astype(np.int64)
        out = pd.array([None] * len(valid), dtype="Int64")
        out[valid] = words
        return pd.Series(out)

    return _word(_c(emb))


def dot_product_arrow(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via an Arrow-batched numpy kernel — the hot-path variant.

    Catalyst higher-order folds are interpreted per element (~17 µs per
    64-dim dot, measured); the Arrow batch moves whole columns once and
    runs a single vectorized einsum (~2.6× faster on a 200k-pair verify
    at sf0.1, and the gap widens with pair count — this is the 100 TB
    path for candidate-pair verification).  float64 accumulation; across
    200k pairs the 6dp-rounded results were bit-identical to the JVM
    left fold.  Keep the JVM ``dot_product`` for small/broadcast-side
    workloads where Python worker spin-up dominates.

    NULL/ragged rows on EITHER side (or a dimension mismatch between the
    two sides) yield SQL NULL, matching the Catalyst zip_with/aggregate
    fold on NULL input — not a stage-killing ValueError.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(xa, xb):
        import numpy as np
        import pandas as pd

        ra, rb = xa.to_numpy(), xb.to_numpy()
        try:
            A = np.vstack(ra).astype(np.float64)
            B = np.vstack(rb).astype(np.float64)
        except (ValueError, TypeError):
            A = B = None
        if (A is not None and A.ndim == 2 and A.shape == B.shape
                and not np.isnan(A).any() and not np.isnan(B).any()):
            return pd.Series(np.einsum("ij,ij->i", A, B))
        # slow path (corrupt batch): validate each row pair independently
        # — no cross-row dimension coupling, so a batch mixing dims still
        # computes every self-consistent pair and NULLs only the broken
        # ones (NULL either side, ragged pair, NaN element)
        out = pd.array([None] * len(ra), dtype="Float64")
        for i in range(len(ra)):
            va = _row_valid(ra[i], None)
            vb = _row_valid(rb[i], None)
            if va is not None and vb is not None and va.shape == vb.shape:
                out[i] = float(np.dot(va, vb))
        return pd.Series(out)

    return _dot(_c(a), _c(b))
