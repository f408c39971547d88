"""Shared helpers for catalog operators (numeric-parity conventions)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# money/measure columns are computed on DECIMAL, never summed as double:
# float summation order differs between engines/partitionings, DECIMAL is
# associative — the only way a distributed sum hash-matches a single-node
# oracle (and stays reproducible across cluster sizes).
DEC2 = "decimal(18,2)"
DEC4 = "decimal(18,4)"
SUM2 = "decimal(38,2)"
SUM4 = "decimal(38,4)"


def dec2(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC2)


def money_sum(col: Column, scale4: bool = False) -> Column:
    """SUM over a decimal expression with a pinned output type."""
    return F.sum(col).cast(SUM4 if scale4 else SUM2)
