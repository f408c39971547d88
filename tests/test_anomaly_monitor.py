"""VolumeAnomalyMonitor: incremental daily-count state == batch
recompute over everything ingested (shared z kernel); late-data
correction; replay idempotence; fresh-checkpoint epoch reset; alarm
fires within the batch that lands the spike.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.operators.analytics import events_anomaly_zscore
from debezium_nats_cdc_spark.streaming.anomaly_monitor import (
    VolumeAnomalyMonitor,
)

_EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                  "event_type string, value double, props string")


def _events(spark, rows):
    data = [(i, ts, 1, et, None, None) for i, (et, ts) in enumerate(rows)]
    return spark.createDataFrame(data, _EVENTS_SCHEMA)


def _expand(type_day_counts):
    rows = []
    for et, day, count in type_day_counts:
        rows += [(et, datetime(2024, 1, day, 12, 0))] * count
    return rows


# three micro-batches; batch 3 carries LATE events for day 2 plus the
# day-5 spike
B1 = _expand([("a", 1, 1), ("a", 2, 1), (None, 1, 3)])
B2 = _expand([("a", 3, 3), ("a", 4, 2), ("b", 1, 5)])
B3 = _expand([("a", 2, 1), ("a", 5, 20)]) + [("a", None)]  # late + spike + NULL ts


def _batch_ground_truth(spark, tmp_path, all_rows):
    (_events(spark, all_rows).write.mode("overwrite")
     .parquet(f"{tmp_path}/events.parquet"))
    return events_anomaly_zscore(spark, str(tmp_path))


def _rows(df):
    # repr-key sort: the NULL event_type stratum breaks None < str
    return sorted(map(tuple, df.collect()), key=repr)


def test_incremental_equals_batch_recompute(spark, tmp_path):
    mon = VolumeAnomalyMonitor(str(tmp_path / "mon"))
    for i, b in enumerate([B1, B2, B3]):
        mon.process_batch(spark, _events(spark, b), epoch_id=i)
    expect = _batch_ground_truth(spark, tmp_path / "truth", B1 + B2 + B3)
    assert _rows(mon.scored(spark)) == _rows(expect)
    # day-2's count is the CORRECTED 2 (1 from B1 + 1 late from B3)
    d2 = [r for r in mon.daily_counts(spark).collect()
          if r.event_type == "a" and r.event_day == "2024-01-02"]
    assert d2[0].n_events == 2


def test_spike_alarms_within_its_batch(spark, tmp_path):
    mon = VolumeAnomalyMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)
    assert mon.alarms(spark).count() == 0  # nothing anomalous yet
    mon.process_batch(spark, _events(spark, B3), epoch_id=2)
    alarms = mon.alarms(spark).collect()
    assert [(r.event_type, r.event_day) for r in alarms] == \
        [("a", "2024-01-05")]
    # trailing stats for day 5: counts 1,2,3,2 -> mean=2, var=2/3
    assert alarms[0].n_prev_days == 4 and alarms[0].n_events == 20


def test_replayed_epoch_is_noop(spark, tmp_path):
    mon = VolumeAnomalyMonitor(str(tmp_path / "mon"))
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)
    snap = _rows(mon.daily_counts(spark))
    mon.process_batch(spark, _events(spark, B2), epoch_id=1)  # replay
    mon.process_batch(spark, _events(spark, B1), epoch_id=0)  # older replay
    assert _rows(mon.daily_counts(spark)) == snap
    assert mon.last_epoch(spark) == 1


def test_streaming_entrypoint(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _events(spark, B1).coalesce(1).write.parquet(f"{src}/f0")
    _events(spark, B2).coalesce(1).write.parquet(f"{src}/f1")
    mon = VolumeAnomalyMonitor(str(tmp_path / "mon"))
    stream = (spark.readStream.schema(_EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/f*"))
    mon.start(spark, stream).awaitTermination()
    expect = _batch_ground_truth(spark, tmp_path / "truth", B1 + B2)
    assert _rows(mon.scored(spark)) == _rows(expect)


def test_fresh_checkpoint_restart_keeps_folding(spark, tmp_path):
    """A checkpoint reset restarts epoch ids at 0; the replay guard must
    not silently drop the new data (the TfidfMonitor contract)."""
    root = str(tmp_path / "mon")
    mon = VolumeAnomalyMonitor(root)
    mon.process_batch(spark, _events(spark, B1), epoch_id=40)
    mon.process_batch(spark, _events(spark, B2), epoch_id=41)
    assert mon.last_epoch(spark) == 41

    # restart with a FRESH checkpoint on a NEW source: epochs restart
    # at 0, which the stale guard (41) would silently drop without the
    # start()-time reset
    src = tmp_path / "src2"
    src.mkdir()
    _events(spark, B3).coalesce(1).write.parquet(f"{src}/f0")
    mon2 = VolumeAnomalyMonitor(root)
    stream = (spark.readStream.schema(_EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/f*"))
    mon2.start(spark, stream).awaitTermination()
    expect = _batch_ground_truth(spark, tmp_path / "truth", B1 + B2 + B3)
    assert _rows(mon2.scored(spark)) == _rows(expect)
    assert mon2.last_epoch(spark) == 0  # the new checkpoint's sequence
