"""Vacuous-fuzz audit gate (VERDICT r10 #4).

The join_asof_last_click NULL-user bug survived TWO rounds of "green"
fuzz because every pre-r10 seed produced empty result sets for that
query — an ok over empty-vs-empty proves almost nothing.  This gate
makes that failure class structural instead of luck:

  * the committed FUZZCOV.json artifact (written by
    ``tools/fuzz_oracle.py --seeds ... --fuzzcov FUZZCOV.json``)
    records each query's result-row counts across the round's seeds;
  * every oracle-backed catalog query must appear in it (a new query
    forces a regenerated artifact, so coverage can't silently rot);
  * any query whose MEDIAN fuzz rows is 0 must carry an explicit
    justification in ``fuzz_oracle.VACUOUS_JUSTIFIED`` — otherwise
    the fix is a gen_tables extension, not an allowlist entry;
  * justifications must not go stale: an entry for a query that now
    fuzzes non-empty (or left the catalog) fails too.

No Spark session needed — this audits the artifact, not the engines.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def _artifact() -> dict:
    p = REPO / "FUZZCOV.json"
    assert p.exists(), (
        "FUZZCOV.json missing — run python tools/fuzz_oracle.py "
        "--seeds A,B,... --fuzzcov FUZZCOV.json and commit it")
    with open(p) as f:
        return json.load(f)


def test_fuzzcov_covers_every_oracle_backed_query():
    from debezium_nats_cdc_spark import catalog

    art = _artifact()
    oracle_backed = {n for n, e in catalog.entries().items()
                     if e.oracle is not None}
    missing = sorted(oracle_backed - set(art["per_query"]))
    assert not missing, (
        f"FUZZCOV.json predates these catalog queries — regenerate: "
        f"{missing}")
    assert len(art["seeds"]) >= 3, "need >= 3 seeds for a stable median"


def test_no_unjustified_median_zero_queries():
    import fuzz_oracle

    art = _artifact()
    vacuous = sorted(
        n for n, r in art["per_query"].items()
        if r["median"] == 0 and n not in fuzz_oracle.VACUOUS_JUSTIFIED)
    assert not vacuous, (
        f"median fuzz rows is 0 with no justification for {vacuous} — "
        f"extend tools/fuzz_oracle.gen_tables so these queries exercise "
        f"real rows, or add a justified VACUOUS_JUSTIFIED entry")


def test_justifications_are_not_stale():
    import fuzz_oracle

    from debezium_nats_cdc_spark import catalog

    art = _artifact()
    ents = catalog.entries()
    for name in fuzz_oracle.VACUOUS_JUSTIFIED:
        assert name in ents, f"VACUOUS_JUSTIFIED entry {name} left the catalog"
        rec = art["per_query"].get(name)
        assert rec is not None, f"{name} justified but absent from FUZZCOV"
        assert rec["median"] == 0, (
            f"{name} now fuzzes non-empty (median {rec['median']}) — "
            f"drop its stale VACUOUS_JUSTIFIED entry")
