"""Pin the driver-effective oracle window.

The driver verifies the first 50 entries of ``__spark_entry__.queries()``
per round.  Round 5's rotation silently failed because a module-scope
import in __spark_entry__ front-ran catalog registration order
(VERDICT r5) — so these tests import __spark_entry__ exactly the way the
driver does (by file path) and assert the resulting order equals the
explicit plan in catalog._WINDOW_ORDER, independent of import side
effects.  No SparkSession needed: registration is pure Python.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_queries() -> list[str]:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries().keys())


def test_driver_effective_window_matches_plan():
    from debezium_nats_cdc_spark import catalog

    names = _driver_queries()
    assert len(catalog._WINDOW_ORDER) == 50
    assert names[:50] == catalog._WINDOW_ORDER


def test_catalog_is_complete_and_window_order_has_no_unknowns():
    from debezium_nats_cdc_spark import catalog

    names = _driver_queries()
    assert len(names) == len(set(names))
    assert set(catalog._WINDOW_ORDER) <= set(names)


def test_every_window_query_has_an_oracle_or_known_exemption():
    # Full-oracle coverage is the contract; a window slot without an
    # oracle row silently downgrades to a rows-only check.
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    oracles = mod.oracle_sql()
    missing = [n for n in list(mod.queries().keys())[:50] if n not in oracles]
    assert missing == [], f"window queries without oracle SQL: {missing}"
