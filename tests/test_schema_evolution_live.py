"""A3 schema evolution through a LIVE checkpointed pipeline.

The reference tracks DDL via FileSchemaHistory
(config/debezium/application.properties:15-16) so envelopes before and
after an ALTER TABLE decode correctly.  Engine analog: a v2 schema is
registered (append-only nullable field, schemas.evolve_table_schema),
the checkpointed pipeline restarts against the SAME checkpoint/state
dirs, and v1+v2 data must coexist:

- v2 envelopes parse with the new field populated
- pre-evolution state rows surface NULL for the new field
- the audit trail records the new field's first change
- streaming continuity: the restart resumes from the checkpoint (phase-1
  events are not reprocessed)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F, types as T

from debezium_nats_cdc_spark import schemas
from debezium_nats_cdc_spark.sources import fixtures
from debezium_nats_cdc_spark.streaming.pipeline import (
    read_state,
    run_pipeline_until_done,
)


def test_v2_envelope_through_checkpointed_pipeline(spark, tmp_path):
    root = str(tmp_path)
    log_dir = os.path.join(root, "log")

    # ---- phase 1: v1 schema — snapshot the three seed employees
    v1_events = [
        fixtures.envelope("employees", "r", None, row, fixtures.BASE_TS_MS - 1000)
        for row in fixtures.SEED_EMPLOYEES
    ] + fixtures.golden_workload()  # real c/u/d traffic under v1
    fixtures.write_event_log(v1_events, log_dir, events_per_file=10)
    run_pipeline_until_done(spark, root + "/log", root, tables=["employees"])
    n_events_phase1 = spark.read.parquet(
        os.path.join(root, "hr_events")).count()

    # ---- DDL: ALTER TABLE employees ADD COLUMN badge_color (nullable)
    schemas.evolve_table_schema(
        "employees", [T.StructField("badge_color", T.StringType())]
    )
    try:
        emp1 = fixtures.SEED_EMPLOYEES[0]
        v2_events = [
            fixtures.envelope(
                "employees", "u",
                {**emp1, "badge_color": None},
                {**emp1, "badge_color": "gold"},
                fixtures.BASE_TS_MS + 5000,
            )
        ]
        # new chunk file beside phase 1's (checkpoint skips the old ones)
        v2_dir = os.path.join(root, "v2-staging")
        fixtures.write_event_log(v2_events, v2_dir, events_per_file=10)
        os.rename(os.path.join(v2_dir, "chunk-00000.json"),
                  os.path.join(log_dir, "chunk-v2-00000.json"))
        dirs = run_pipeline_until_done(spark, log_dir, root,
                                       tables=["employees"])

        # state continuity: v2 row has the field, v1 rows read as NULL
        emp = read_state(spark, dirs, "employees")
        badge = {r["employee_number"]: r["badge_color"] for r in emp.collect()}
        assert badge["EMP001"] == "gold"
        assert badge["EMP002"] is None and badge["EMP003"] is None

        # checkpoint continuity: phase-1 events were NOT reprocessed
        ev = spark.read.parquet(os.path.join(root, "hr_events"))
        assert ev.count() > n_events_phase1  # the v2 update landed
        assert ev.groupBy("event_id").count().filter("count > 1").count() == 0

        # audit continuity: the badge_color change is recorded field-level
        audit = spark.read.parquet(os.path.join(root, "audit_trail"))
        row = audit.filter(
            (F.col("field") == "badge_color") & (F.col("new_value") == "gold")
        )
        assert row.count() == 1
    finally:
        schemas.rollback_table_schema("employees")


def test_evolution_guards():
    import pytest

    with pytest.raises(ValueError):  # NOT NULL additions need a migration
        schemas.evolve_table_schema(
            "departments", [T.StructField("x", T.StringType(), nullable=False)]
        )
    with pytest.raises(ValueError):  # duplicate field
        schemas.evolve_table_schema(
            "departments", [T.StructField("name", T.StringType())]
        )
    with pytest.raises(ValueError):  # nothing to roll back
        schemas.rollback_table_schema("departments")
