"""NATS-style subject glob matching as Spark column expressions.

The reference routes everything through hierarchical NATS subjects
(``HCM.CDC.HR.<db>.<table>``, ``events.hr.<category>.<type>``,
``hr.external.payroll.*`` — reference config/debezium/application.properties:12,23,
docs/design.md:81-111).  In this engine subjects are *data* (a string
column), and wildcard routing is a filter predicate:

  ``*``  matches exactly one dot-separated token
  ``>``  matches one-or-more trailing tokens (must be last)

Compiled to an anchored regex so Catalyst can evaluate it JVM-side.
For the common prefix form ``A.B.>`` we instead emit ``startswith``,
which stays pushdown-friendly (SURVEY.md §4: rlike blocks parquet
predicate pushdown; startswith converts to a StringStartsWith filter).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_TOKEN = r"[^.]+"


def subject_to_regex(pattern: str) -> str:
    """Compile a NATS subject glob to an anchored regex string."""
    parts = pattern.split(".")
    out = []
    for i, p in enumerate(parts):
        if p == ">":
            if i != len(parts) - 1:
                raise ValueError(f"'>' must be the last token: {pattern!r}")
            out.append(rf"{_TOKEN}(\.{_TOKEN})*")
        elif p == "*":
            out.append(_TOKEN)
        else:
            out.append(re.escape(p))
    return "^" + r"\.".join(out) + "$"


def subject_match(col: Column | str, pattern: str) -> Column:
    """Predicate column: does ``col`` match the NATS glob ``pattern``?"""
    c = F.col(col) if isinstance(col, str) else col
    parts = pattern.split(".")
    if ">" in parts[:-1]:
        raise ValueError(f"'>' must be the last token: {pattern!r}")
    if "*" not in pattern and not pattern.endswith(">"):
        return c == F.lit(pattern)  # exact — equality pushes down
    if parts[-1] == ">" and all(p not in ("*", ">") for p in parts[:-1]):
        # pure prefix form — startswith pushes down to the scan
        return c.startswith(".".join(parts[:-1]) + ".")
    return c.rlike(subject_to_regex(pattern))
