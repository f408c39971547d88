"""Driver-facing query registry.

Every operator from SURVEY.md §2 that is implemented registers here with:
  - a Spark callable  (spark, sf_dir) -> DataFrame
  - an equivalent ANSI-SQL oracle string runnable by DuckDB on the same
    parquet tables (or None for genuinely non-SQL-expressible ops — the
    driver then records a weaker rows-only check)
  - the SURVEY §2 operator ids it covers (for the judge's parity check)

Column-name parity rule (driver contract): the compare sorts columns by
name before hashing, so every computed column is aliased identically in
the Spark code and the oracle SQL.

Numeric parity rules (hard-won, see tests/test_corpus_ops.py and the
driver's CORRECTNESS_r*.json three-way compares):
  - money/derived aggregates are computed on DECIMAL, never summed as
    double (float summation order differs across engines)
  - DuckDB SUM(BIGINT) returns HUGEINT and AVG returns DOUBLE — oracles
    cast explicitly so schemas line up with Spark's types
  - raw double *columns* pass through untouched (bit-identical in parquet)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CatalogEntry:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: list[str] = field(default_factory=list)
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None, survey_ids: list[str], doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the catalog."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = CatalogEntry(name, fn, oracle, survey_ids, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _load_modules() -> None:
    # Import for registration side effects. ORDER IS LOAD-BEARING: the
    # driver's correctness harness verifies the first 50 registered
    # queries per round, so coverage rotates under one hard rule: every
    # module whose implementation CHANGED this round registers inside
    # the window; remaining slots go to the queries whose last green row
    # is OLDEST.  Round 5 touched dedup (anchor-fallback BUCKET_CAP),
    # sampling ('und' stratum), curation (oracle twin + pii concat), and
    # multimodal (audio oracle bound) — those lead (text rides along
    # because curation imports it): dedup 7 + sampling 5 + text 9 +
    # curation 3 + multimodal 5 = 29.  The rest of the window rotates
    # the r2-era tail back in (VERDICT r4 task #1): windows 5 +
    # aggregates 6 + joins 8 = 48, then quantize (r3) and advanced's
    # first query (r3) fill slots 49-50.  Outside the window (23):
    # advanced's remaining 6 (r3/r5-green) plus cdc_queries 11 and
    # similarity 6 (all r4-green, untouched this round).
    # tools/check_rotation.py audits this statement against git and the
    # CORRECTNESS artifacts.
    from .operators import (  # noqa: F401
        dedup,
        sampling,
        curation,  # imports text first: text's 9 register before these 3
        multimodal,
        windows,
        aggregates,
        joins,
        quantize,
        advanced,
        cdc_queries,
        similarity,
        text,
    )


def entries() -> dict[str, CatalogEntry]:
    _load_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: e.fn for n, e in entries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: e.oracle for n, e in entries().items() if e.oracle is not None}
