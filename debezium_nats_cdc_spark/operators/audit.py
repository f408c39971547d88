"""Field-level audit trail (SURVEY.md §2.F6/E3).

The reference's audit_trail carries one row per changed field with
old_value/new_value (docs/design.md:185-197).  Implemented structwise on
the full-row before/after images — possible statelessly because the
source guarantees FULL row images (binlog-row-image=FULL,
docker-compose.yml:17) — via map_from_arrays + explode: pure column
expressions + one generator, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def field_diff(unwrapped: DataFrame, columns: list[str]) -> DataFrame:
    """audit_trail rows: one per field that differs between before/after.

    op='c': every non-null after field (old_value NULL);
    op='d': every non-null before field (new_value NULL);
    op='u': fields where before <> after (null-safe).

    The two select-lists (one py4j node per expression, ~6 per audited
    column) build once per (column set, SparkContext) — this runs in
    foreachBatch every micro-batch (speccache.py / BENCHLOG r6).
    """
    from ..speccache import per_context

    def build() -> tuple[list[F.Column], list[F.Column]]:
        def old_of(c: str) -> F.Column:
            return F.col(f"before.{c}").cast("string")

        def new_of(c: str) -> F.Column:
            return F.col(f"after.{c}").cast("string")

        changed = F.map_from_arrays(
            F.array(*[F.lit(c) for c in columns]),
            F.array(
                *[
                    F.when(
                        ~old_of(c).eqNullSafe(new_of(c)),
                        F.struct(old_of(c).alias("old"), new_of(c).alias("new")),
                    )
                    for c in columns
                ]
            ),
        )
        explode_cols = [
            F.col("table").alias("entity_type"),
            F.coalesce(F.col("after.id"), F.col("before.id")).cast("string").alias("entity_id"),
            F.col("op"),
            F.col("event_time").alias("changed_at"),
            F.col("change_key").alias("event_id"),
            F.explode(F.map_filter(changed, lambda k, v: v.isNotNull())).alias("field", "vals"),
        ]
        out_cols = [
            F.md5(F.concat_ws("|", "event_id", "field")).alias("audit_id"),
            F.col("entity_type"),
            F.col("entity_id"),
            F.when(F.col("op") == "c", "INSERT")
            .when(F.col("op") == "u", "UPDATE")
            .when(F.col("op") == "d", "DELETE")
            .otherwise("SNAPSHOT")
            .alias("operation"),
            F.lit(None).cast("string").alias("changed_by"),
            F.col("changed_at"),
            F.col("vals.old").alias("old_value"),
            F.col("vals.new").alias("new_value"),
            F.col("event_id"),
            F.col("field"),
        ]
        return explode_cols, out_cols

    explode_cols, out_cols = per_context(("field_diff", tuple(columns)), build)
    return unwrapped.select(*explode_cols).select(*out_cols)
