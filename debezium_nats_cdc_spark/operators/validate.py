"""Validation + dead-letter split (SURVEY.md §2.F4/B7).

The reference validates event structure + business rules before publish
(docs/design.md:146,640-641; JSON Schema docs/design.md:943-972) and
routes failures to a DLQ (docs/system-design.md:373,400).  Engine form:
one pass computing a reason column; valid/invalid split is two filters
over the same cached batch (no double scan in foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# required fields per the EmployeeHiredEvent JSON Schema shape
# (docs/design.md:943-972): eventId, eventType, timestamp, aggregateId, payload
REQUIRED = ["eventId", "eventType", "timestamp", "aggregateId", "payload"]

def _structural_reason() -> F.Column:
    """The structural-check coalesce chain, built once per SparkContext
    (foreachBatch would otherwise rebuild this ~40-node tree over py4j
    every micro-batch — BENCHLOG r6; rationale in speccache.py)."""
    from ..speccache import per_context

    def build() -> F.Column:
        reason = F.lit(None).cast("string")
        # later checks win by being applied first in the coalesce chain
        checks = [
            (F.col(c).isNull(), f"missing_{c}") for c in REQUIRED
        ] + [
            (F.get_json_object("payload", "$").isNull(), "payload_not_json"),
            (F.length("eventType") == 0, "empty_event_type"),
        ]
        for cond, why in checks:
            reason = F.coalesce(reason, F.when(cond, F.lit(why)))
        return reason

    return per_context("validate.structural_reason", build)


def with_validation(events: DataFrame, registry=None) -> DataFrame:
    """Add ``invalid_reason`` (NULL = valid).

    With a ``registry`` (registry.SchemaRegistry), structural envelope
    checks are followed by the versioned payload-contract check: a
    payload missing a required field (or unparseable) under the latest
    registered schema for its eventType gets a
    ``schema:<subject>:v<N>:<fields>`` reason, and every row is stamped
    with ``schema_version`` (the contract it was judged against — NULL
    for uncontracted types).  Both are single JVM-side projections."""
    reason = _structural_reason()
    helpers: list[str] = []
    if registry is not None:
        # contract_check materializes the union-schema parse ONCE per
        # row; the single-Column violation_expr form re-parsed the
        # payload per (subject x required field) because codegen cannot
        # hoist subtrees out of conditional WHEN branches (measured 5x
        # on the events sink, BENCHLOG r6)
        events, contract_reason, helpers = registry.contract_check(events)
        reason = F.coalesce(reason, contract_reason)
        events = events.withColumn("schema_version", registry.version_expr())
    out = events.withColumn("invalid_reason", reason)
    return out.drop(*helpers) if helpers else out


def split_valid(events: DataFrame,
                registry=None) -> tuple[DataFrame, DataFrame]:
    """(valid, dead_letter) — dead-letter rows keep the reason column
    (and, with a registry, the contract version they failed against)."""
    v = with_validation(events, registry)
    return (
        v.filter(F.col("invalid_reason").isNull()).drop("invalid_reason"),
        v.filter(F.col("invalid_reason").isNotNull()),
    )


def mask_pii(events: DataFrame, json_fields: list[str]) -> DataFrame:
    """Mask configured payload fields in outbound events
    (docs/design.md:883-884): deterministic sha2 so joins on masked
    values still work across tables."""
    out = events
    for fld in json_fields:
        val = F.get_json_object("payload", f"$.{fld}")
        hashed = F.sha2(val, 256)
        # rewrite the payload JSON with the masked value when present
        out = out.withColumn(
            "payload",
            F.when(
                val.isNotNull(),
                F.regexp_replace(
                    "payload",
                    F.concat(F.lit(f'"{fld}"\\s*:\\s*"'), F.lit("[^\"]*"), F.lit('"')),
                    F.concat(F.lit(f'"{fld}":"'), hashed, F.lit('"')),
                ),
            ).otherwise(F.col("payload")),
        )
    return out
