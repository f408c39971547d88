"""Stream-stream watermarked join (C6 streaming twin).

Feeds the golden workload's employees and salary_changes topics as two
live streams and asserts the SalaryAdjusted correlation: the salary
change joins the hiring event of the same employee (within the lag
window), with bounded state (watermarks both sides).
"""

from __future__ import annotations

import os

from debezium_nats_cdc_spark.sources import fixtures
from debezium_nats_cdc_spark.sources.cdc import read_change_stream
from debezium_nats_cdc_spark.streaming.stream_join import correlate_salary_changes


def test_salary_change_correlates_with_hire(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    events = fixtures.snapshot_events() + fixtures.golden_workload()
    fixtures.write_event_log(events, log_dir, events_per_file=5)

    emp = read_change_stream(spark, log_dir, "employees")
    sc = read_change_stream(spark, log_dir, "salary_changes")
    joined = correlate_salary_changes(emp, sc)

    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("salary_corr")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM salary_corr").collect()
    # golden workload: EMP999 (id 4) hired at 90000, then raised to 95000
    assert len(rows) >= 1
    by_change = {r["change_id"]: r for r in rows}
    assert 1 in by_change
    r = by_change[1]
    assert r["employee_id"] == 4
    assert r["employee_number"] == "EMP999"
    assert float(r["old_salary"]) == 90000.0
    assert float(r["new_salary"]) == 95000.0
    assert r["emp_time"] <= r["sc_time"]
