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
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
