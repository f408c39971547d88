"""Driver-verified monitor PUBLISH tables (VERDICT r11 task 4 — the
r10 stretch #10 design, landed as catalog queries in the r12 EVEN
window).

The three user-keyed streaming monitors (funnel / engagement / cohort,
SURVEY §2.D2+H8) are pytest-verified by state==batch equality after
every micro-batch, and their published tables hash-match the DuckDB
oracles in-process (tests/test_monitor_publish_oracle.py).  These
queries give the SAME contract real driver rows: each ingests the
driver's events table through the monitor in three deterministic
micro-batches (split on ``pmod(event_id, 3)`` — a partition of the
table, so the union of batches is exactly the batch query's input),
then returns the monitor's published table.  The oracle is the batch
twin's REGISTERED oracle SQL, imported from the registry rather than
copied, so the two registrations can never drift.

What a green driver row proves that the in-process tests do not: the
published table survives the driver's own end-to-end canonicalization
(vanilla session, DuckDB ``.df()`` rendering, raw-str hashing) on the
driver's own data — the exact gate every batch catalog query lives
under.  Equality holds because each monitor's state fold is exactness-
preserving over its ingested history (the pruning/compaction proofs in
each monitor's module docstring) and the monitors are fed the full
table with no watermark-driven compaction, so ``scored()`` over the
three batches equals the batch kernel over the whole table.

Cost shape: per batch, one shuffle keyed on the monitor's state key
(user_id) over state+batch — at 100 TB this is the foreachBatch loop
these monitors already run in production (STREAMSTATE.md carries their
measured state bounds); the 3-batch replay here exists to exercise that
loop under the oracle, not to model a deployment.

Reference parity: the reference specifies real-time materialized views
over CDC streams (`docs/system-design.md` materialized-view section);
these are the engine's user-keyed instances, driver-checked.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

# importing the batch twins registers their oracles; pulling the SQL
# from the registry (not a copy) keeps publish and batch in lockstep
from . import engagement as _engagement  # noqa: F401
from . import funnel as _funnel  # noqa: F401
from ..catalog import _REGISTRY, register
from ..io import load_table

_BATCHES = 3


def _ingest(spark: SparkSession, sf_dir: str, mon) -> None:
    """Fold the events table into a monitor as _BATCHES deterministic
    micro-batches (pmod on event_id partitions the table, so the
    ingested union is exactly the batch query's input)."""
    events = load_table(spark, sf_dir, "events")
    for b in range(_BATCHES):
        chunk = events.filter(F.pmod(F.col("event_id"), _BATCHES) == b)
        mon.process_batch(spark, chunk, epoch_id=b)


def _state_root(kind: str) -> str:
    """Fresh per-invocation state dir, reaped at process exit (the
    `ann_lifecycle._scratch_index_dir` pattern, VERDICT r13 task 4):
    `scored()` reads the published state LAZILY, so an inline cleanup
    would race the driver's collect — but without any cleanup a bench
    session leaks one state copy per invocation.  Fresh-per-invocation
    also guarantees no cross-query state leakage: two runs of the same
    query never share a fold history."""
    import atexit
    import shutil

    d = tempfile.mkdtemp(prefix=f"monitor_publish_{kind}_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


@register(
    "monitor_funnel_publish",
    oracle=_REGISTRY["events_funnel_conversion"].oracle,
    survey_ids=["D2", "H8"],
    doc="FunnelMonitor's published table after a 3-micro-batch ingest "
        "of the events table, vs the batch funnel query's oracle: the "
        "streaming state fold is exactness-preserving, so the published "
        "strict-order funnel summary must equal the batch kernel over "
        "the full table — now proven under the driver's own "
        "cross-engine hash, not just in-process (VERDICT r11 task 4).",
)
def monitor_funnel_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.funnel_monitor import FunnelMonitor

    mon = FunnelMonitor(_state_root("funnel"))
    _ingest(spark, sf_dir, mon)
    return mon.scored(spark)


@register(
    "monitor_engagement_publish",
    oracle=_REGISTRY["events_dau_wau"].oracle,
    survey_ids=["D2", "H8"],
    doc="EngagementMonitor's published DAU/WAU/stickiness table after a "
        "3-micro-batch ingest, vs the batch events_dau_wau oracle — the "
        "distinct-(user, day) state merge is idempotent and commutative, "
        "so the published table must equal the batch kernel over the "
        "full table (VERDICT r11 task 4).",
)
def monitor_engagement_publish(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..streaming.engagement_monitor import EngagementMonitor

    mon = EngagementMonitor(_state_root("engagement"))
    _ingest(spark, sf_dir, mon)
    return mon.scored(spark)


@register(
    "monitor_cohort_publish",
    oracle=_REGISTRY["events_cohort_retention"].oracle,
    survey_ids=["D2", "D4", "H8"],
    doc="CohortMonitor's published weekly cohort-retention matrix after "
        "a 3-micro-batch ingest, vs the batch events_cohort_retention "
        "oracle — the distinct-(user, week) state merge is idempotent "
        "and commutative, so the published matrix must equal the batch "
        "kernel over the full table (VERDICT r11 task 4).",
)
def monitor_cohort_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.cohort_monitor import CohortMonitor

    mon = CohortMonitor(_state_root("cohort"))
    _ingest(spark, sf_dir, mon)
    return mon.scored(spark)
