"""Cross-engine-stable hash expressions.

The engine's oracle-checkable operators derive integer hashes from md5
hex (xxhash64 has no ANSI-SQL twin).  The ONE derivation that must stay
bit-identical to every DuckDB oracle's
``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`` lives here —
editing it in one call site but not the others would silently break
oracle parity for just that operator.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_60(col: Column | str) -> Column:
    """First 60 bits of md5(col) as a non-negative BIGINT (15 hex chars
    parse losslessly; 16 could overflow the sign bit)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
