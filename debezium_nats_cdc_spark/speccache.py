"""Per-SparkContext cache for built Column/Window specs.

Constructing a Column forest costs one py4j round trip per expression
node.  That is invisible in ad-hoc queries but dominates foreachBatch,
which re-applies the same transformations to a NEW DataFrame every
micro-batch: profiled at 0.9-1.5 s of pure expression building per
1k-event batch before caching (BENCHLOG r6), more than the plans took
to execute.

Column and WindowSpec objects are immutable and hold no DataFrame
reference — only unresolved attribute names — so a built spec replays
against any DataFrame with the right columns.  Entries key on the
ACTIVE SparkContext's id: a restarted gateway leaves stale JVM object
handles, so entries from any other context are evicted on first use of
a new one.

Usage:
    cols = per_context(("my_op", tuple(params)), lambda: [F.col(...), ...])
    return df.select(*cols)

The builder must close over nothing batch-dependent (no DataFrame, no
per-batch literals).  Anything keyed on mutable state (e.g. the schema
registry's contracts) must version its key or invalidate explicitly —
see registry.SchemaRegistry._cached for the invalidate-on-register
variant.
"""

from __future__ import annotations

from collections.abc import Callable

_CACHE: dict[tuple, object] = {}


def context_token():
    """Identity of the active SparkContext, collision-safe: id() alone
    could recycle a stopped context's address, so pair it with the
    applicationId (one py4j call, ~0.3 ms — noise next to the builds
    this module elides)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return (id(sc), sc.applicationId) if sc is not None else None


def per_context(key, build: Callable[[], object]):
    k = (key, context_token())
    hit = _CACHE.get(k)
    if hit is None:
        stale = [x for x in _CACHE if x[1] != k[1]]
        for x in stale:  # entries from a stopped context are dead handles
            del _CACHE[x]
        hit = _CACHE[k] = build()
    return hit
