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
    # Import for registration side effects only.  Since round 6 the
    # import order here is deliberately NOT load-bearing: entries()
    # reorders by the explicit _WINDOW_ORDER plan below, so a stray
    # module-scope import elsewhere (the r5 failure: __spark_entry__
    # imported operators.cdc_queries before this ran, silently
    # displacing the planned window tail — VERDICT r5) can no longer
    # change what the driver verifies.
    from .operators import (  # noqa: F401
        dedup,
        sampling,
        curation,  # imports text first
        multimodal,
        windows,
        aggregates,
        joins,
        quantize,
        advanced,
        cdc_queries,
        similarity,
        stats,
        text,
        ranking,
        layout,
        linalg,
        funnel,
        analytics,
        engagement,
        components,
        monitor_publish,
    )


# The driver's correctness harness verifies the FIRST 50 entries of
# queries() per round.  This list IS the window, verbatim — the first 50
# names below are the round-8 oracle window, in execution order.
# Rotation rules (tools/check_rotation.py audits both, driver-effectively):
#   A. every query whose defining module changed this round is in-window;
#   B. remaining slots go to the queries whose last driver-green row is
#      oldest (nothing stays unverified for >1 round beyond the latest
#      artifact).
#
# STANDING ALTERNATION POLICY (since r7): with 81 queries and 50 slots,
# max staleness ≤1 round is achievable only by strict alternation.  The
# catalog splits into two halves that swap in-window residency every
# round:
#   half ODD  (31): cdc_queries 11, text 9, curation 3, multimodal 5,
#                   aggregates' displaced 3 — in-window on ODD rounds;
#   half EVEN (31): joins 9, windows 7, sampling 6, advanced 7,
#                   quantize-or-sim remainder — in-window on EVEN rounds;
#   the ~19 remaining slots each round go to rule-A (touched/new
#   modules) first, then to fillers from the off-phase half.
# Rule A overrides the phase: a touched module's queries enter the
# window regardless of phase, displacing fillers only (never the
# on-phase half).  Result: every query is driver-green in round N or
# N−1, by construction.
#
# Round-12 plan (EVEN phase, per the r11 verdict task 2 + COVERAGE.md).
# Catalog surgery first, to restore the 50/50 half split the policy
# needs (99 queries + 3 new publish queries would have broken the
# ≤1-round-staleness invariant for good — ceil(102/2) = 51 > 50):
#   * RETIRED: dedup_cluster_assign (the r8 pointer-jumping-only CC
#     registration — VERDICT r11 called the two CC queries answering
#     one contract the standing duplication; dedup_cluster_assign_delta,
#     r11-green on the ADAPTIVE kernel under the same true-closure
#     oracle, is the cluster-assignment query; rename back to the
#     canonical name queued for r13's ODD window when it is in-window
#     anyway).  The module-level function remains as a delegate.
#   * MERGED: dedup_exact_groups + dedup_exact_keep_first ->
#     dedup_exact_survivors (survivor rows WITH their collapsed copy
#     counts — a superset of both retired outputs, same single digest
#     shuffle).
#   * NEW: monitor_{funnel,engagement,cohort}_publish (VERDICT r11
#     task 4 — the monitors' published tables under real driver rows,
#     oracles imported from their batch twins' registrations).
# Window: the 46 surviving r10-green EVEN-half queries lead, then rule
# A's touched/new modules fill the remaining 4 slots exactly — dedup.py
# (the NEW merged dedup_exact_survivors; its other 6 queries are
# already in the 46) and the NEW monitor_publish.py 3.  joins.py /
# funnel.py / ann_index.py are also touched this round; their queries
# all sit inside the 46.  Exactly 50.  Out of window (50): the whole
# ODD half — the CORRECTNESS_r11 key set verbatim, all r11-green; they
# rotate back in r13.  Catalog total: 100 = two exact 50-query halves.
_WINDOW_ORDER: list[str] = [
    # half EVEN: dedup family (last green r10; defining module touched
    # this round — rule A and rule B agree)
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_exact_substring",
    "dedup_prefix_cluster",
    # rule A: NEW merged exact-dedup query (supersedes
    # dedup_exact_groups + dedup_exact_keep_first), and the adaptive
    # cluster-assign query — components.py was touched by the round's
    # pair-pipeline perf work (gate probe + driver-side sizes), so rule
    # A pulls it in although it is r11-green; the slot comes from the
    # window_field_diff_audit merge below.
    "dedup_exact_survivors",
    "dedup_cluster_assign_delta",
    # half EVEN: sampling (last green r10)
    "corpus_train_split",
    "corpus_stratified_sample",
    "corpus_pack_sequences",
    "corpus_lang_mix",
    "corpus_quality_weighted_sample",
    "corpus_global_shuffle",
    # half EVEN: multimodal stragglers (last green r10)
    "mm_feature_extract",
    "mm_doc_embedding_join",
    # half EVEN: windows (last green r10).  window_field_diff_audit's
    # registration was MERGED into window_lag_timeline (the audit view
    # is a pure projection of the timeline, which now carries the
    # `changed` flag — one window pass, both contracts), freeing the
    # slot rule A needs for dedup_cluster_assign_delta above.
    "window_latest_state_per_key",
    "window_topk_per_group",
    "window_running_total",
    "window_lag_timeline",
    "window_ntile_curriculum",
    "window_state_as_of",
    # half EVEN: aggregates stragglers (last green r10)
    "agg_cube_orders",
    "agg_approx_distinct",
    # half EVEN: joins (last green r10; joins.py touched this round —
    # the ADVICE-r10 salted-hash hardening)
    "join_broadcast_enrich",
    "join_hierarchy_chain",
    "join_self_pairs",
    "join_semi_exists",
    "join_anti_orphans",
    "join_range_interval",
    "join_event_correlation",
    "join_top_orders",
    "join_salted_skew",
    "join_asof_last_click",
    # half EVEN: embedding/quantize/linalg (last green r10)
    "emb_quantize_int8",
    "emb_norm_stats",
    "emb_dim_stats",
    "emb_covariance",
    "emb_pca_project_check",
    # half EVEN: similarity deep cuts (last green r10)
    "sim_ivf_probe_topk",
    "sim_lsh_bucketed_neardup",
    "sim_kmeans_refine",
    # half EVEN: advanced/cdc/text stragglers (last green r10)
    "cdc_sessionization",
    "text_length_percentiles",
    "cdc_tenure_per_user",
    "scalar_functions_showcase",
    # half EVEN: funnel analytics (last green r10; funnel.py touched
    # this round — the shared-kernel consolidation)
    "events_funnel_conversion",
    "events_cohort_retention",
    # rule A: NEW monitor_publish.py (VERDICT r11 task 4 — the three
    # monitors' published tables earn real driver rows; oracles are the
    # batch twins' registered SQL, imported not copied)
    "monitor_funnel_publish",
    "monitor_engagement_publish",
    "monitor_cohort_publish",
]


def entries() -> dict[str, CatalogEntry]:
    _load_modules()
    missing = [n for n in _WINDOW_ORDER if n not in _REGISTRY]
    if missing:
        raise RuntimeError(
            f"catalog._WINDOW_ORDER names unregistered queries: {missing}"
        )
    ordered = {n: _REGISTRY[n] for n in _WINDOW_ORDER}
    for n, e in _REGISTRY.items():  # everything else keeps registration order
        ordered.setdefault(n, e)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: e.fn for n, e in entries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: e.oracle for n, e in entries().items() if e.oracle is not None}
