"""J-surface stateful operator + A3 schema-evolution behavior."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.operators.unwrap import unwrap
from debezium_nats_cdc_spark.sources import fixtures
from debezium_nats_cdc_spark.sources.cdc import read_change_stream
from debezium_nats_cdc_spark.streaming.stateful import salary_change_tracker


def test_salary_tracker_state_across_batches(spark, tmp_path):
    """Two micro-batches; state (last_salary) must carry across them."""
    base = fixtures.SEED_EMPLOYEES[0]
    evs = []
    for i, sal in enumerate([100000.0, 105000.0, 103000.0]):
        before = {**base, "salary": sal - 1} if i else None
        evs.append(
            fixtures.envelope("employees", "u" if i else "c",
                              before, {**base, "salary": sal},
                              fixtures.BASE_TS_MS + i * 1000)
        )
    log_dir = str(tmp_path / "log")
    # 2 files => with maxFilesPerTrigger=1, 3 micro-batches incl. empty
    fixtures.write_event_log(evs[:1], os.path.join(log_dir), events_per_file=1)
    fixtures.write_event_log(evs[1:], os.path.join(log_dir + "2"), events_per_file=2)
    # single dir, one event per file; FileStreamSource orders batches by
    # mtime — pin ascending mtimes so micro-batch order is deterministic
    log = str(tmp_path / "logall")
    fixtures.write_event_log(evs, log, events_per_file=1)
    for i, name in enumerate(sorted(os.listdir(log))):
        os.utime(os.path.join(log, name), (1_700_000_000 + i * 10,) * 2)

    stream = read_change_stream(spark, log, "employees", max_files_per_trigger=1)
    tracked = salary_change_tracker(unwrap(stream))
    q = (
        tracked.writeStream.outputMode("append")
        .format("memory")
        .queryName("salary_track")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        spark.sql("SELECT * FROM salary_track").collect(), key=lambda r: r["ts_ms"]
    )
    assert [(r["prev_salary"], r["salary"]) for r in rows] == [
        (100000.0, 105000.0),
        (105000.0, 103000.0),
    ]
    assert rows[-1]["n_changes"] == 2
    assert rows[-1]["total_delta"] == 3000.0


def test_schema_evolution_newer_fields_nullable(spark):
    """A3: envelopes written by a NEWER producer (extra row fields) parse
    under the current schema (extra fields ignored); envelopes missing
    newer fields read as NULL — 'newer fields nullable' contract."""
    from debezium_nats_cdc_spark.schemas import ENVELOPE_SCHEMAS

    ev = fixtures.golden_workload()[0]
    ev["payload"]["after"]["badge_color"] = "green"   # unknown new field
    del ev["payload"]["after"]["manager_id"]          # producer older than schema

    df = spark.createDataFrame([(json.dumps(ev),)], "value string").select(
        F.from_json("value", ENVELOPE_SCHEMAS["employees"]).alias("env")
    )
    row = df.select("env.payload.after.*").collect()[0]
    assert row["employee_number"] == "EMP999"
    assert row["manager_id"] is None
    assert "badge_color" not in df.select("env.payload.after.*").columns
