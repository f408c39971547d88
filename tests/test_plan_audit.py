"""Catalog-wide plan gate: no query may introduce a cartesian product or
a global (range) sort without a reviewed allowlist entry in
tools/plan_audit.py — and allowlist entries must stay live (a pattern
that disappears must be pruned, so the list is always a true record of
reviewed decisions).  tests/test_plans.py pins individual shapes; this
sweeps the whole surface so a NEW query can't regress silently.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SF = "/root/testdata/sf0.001"


def test_catalog_plan_audit_clean(spark):
    import plan_audit

    rows, violations = plan_audit.run_audit(spark, SF)
    assert not violations, "\n".join(violations)
    assert len(rows) == len(
        __import__("debezium_nats_cdc_spark.catalog", fromlist=["catalog"])
        .entries()
    )
    # full-metrics regression lock: ANY plan-shape drift (new shuffle,
    # lost broadcast/pushdown) fails until reviewed + regenerated via
    # `python tools/plan_audit.py --write-md`
    drift = plan_audit.check_lock(rows)
    assert not drift, "\n".join(drift)
