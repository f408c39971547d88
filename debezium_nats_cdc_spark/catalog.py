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
    )


# The driver's correctness harness verifies the FIRST 50 entries of
# queries() per round.  This list IS the window, verbatim — the first 50
# names below are the round-6 oracle window, in execution order.
# Rotation rules (tools/check_rotation.py audits both, driver-effectively):
#   A. every query whose defining module changed this round is in-window;
#   B. remaining slots go to the queries whose last driver-green row is
#      oldest (nothing stays unverified for >1 round beyond the latest
#      artifact).
# Round-6 plan: the 13 stale queries lead (5 last green r2, 8 last green
# r3 — displaced from the r5 plan by the import front-run), then the 10
# r4-green (joins 4 + similarity 6), then dedup's 7 (module touched this
# round: recall-bound work), then the 8 NEW r6 queries (never verified —
# rule A/B both demand them in-window), then 12 r5-green fillers
# (windows 5, aggregates 2, sampling 5).  Out of window (31), all
# r5-green: cdc_queries 11, text 9, curation 3, multimodal 5, and
# aggregates 3 (the mm_* fillers and three agg fillers ceded their
# slots to the new queries) — those modules are deliberately untouched
# this round and rotate back in r7.
_WINDOW_ORDER: list[str] = [
    # last green r2
    "agg_pivot_returnflag",
    "join_anti_orphans",
    "join_range_interval",
    "join_event_correlation",
    "join_top_orders",
    # last green r3
    "emb_quantize_int8",
    "join_asof_last_click",
    "cdc_sessionization",
    "text_length_percentiles",
    "cdc_tenure_per_user",
    "scalar_functions_showcase",
    "agg_approx_distinct",
    "mm_doc_embedding_join",
    # last green r4
    "join_broadcast_enrich",
    "join_hierarchy_chain",
    "join_self_pairs",
    "join_semi_exists",
    "sim_cosine_topk",
    "sim_nearest_centroid",
    "sim_embedding_neardup",
    "sim_ivf_probe_topk",
    "sim_lsh_bucketed_neardup",
    "sim_kmeans_refine",
    # module touched in r6 (rule A)
    "dedup_exact_groups",
    "dedup_exact_keep_first",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_cluster_assign",
    "dedup_exact_substring",
    # r5-green fillers
    "window_latest_state_per_key",
    "window_topk_per_group",
    "window_running_total",
    "window_lag_timeline",
    "window_field_diff_audit",
    "agg_pricing_summary",
    "agg_daily_event_volume",
    # second r6 wave (rule A: stats is new, windows/quantize touched);
    # agg_metrics_by_type / agg_rollup_region_nation / agg_cube_orders
    # (r5-green, aggregates untouched) ceded these three slots
    "stats_key_skew_report",
    "window_state_as_of",
    "emb_dim_stats",
    # new in r6 (rule A: defining modules touched this round)
    "corpus_global_shuffle",
    "dedup_prefix_cluster",
    "join_salted_skew",
    "window_ntile_curriculum",
    "emb_norm_stats",
    "corpus_train_split",
    "corpus_stratified_sample",
    "corpus_pack_sequences",
    "corpus_lang_mix",
    "corpus_quality_weighted_sample",
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
