"""store.optimize_zorder: OPTIMIZE-style Z-order compaction on the
EVENT-STORE layout (VERDICT r8 item 2 + stretch 9).

Proves, from parquet FOOTER stats alone, that after optimizing a closed
month partition a probe on ANY of the three workload predicates
(event_type equality, event_timestamp range, aggregate_id equality —
docs/system-design.md:130-134's analytics queries) skips >= 50% of the
files, while the open month keeps its append layout untouched and no
row is lost or duplicated.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from debezium_nats_cdc_spark import store
from debezium_nats_cdc_spark.operators.layout import (
    file_minmax_stats,
    skipped_fraction,
)

_TYPES = ["EmployeeHired", "EmployeePromoted", "EmployeeTerminated",
          "EmployeeTransferred", "SalaryChanged", "TeamChanged"]

# Jan 2026 (closed) + Feb 2026 (open)
_JAN = 1767225600  # 2026-01-01 00:00:00 UTC
_FEB = 1769904000  # 2026-02-01


def _envelopes(spark, n: int, base_ts: int, span_s: int):
    """Synthetic domain envelopes in to_store_rows' input shape."""
    type_arr = F.array(*[F.lit(t) for t in _TYPES])
    return spark.range(n).select(
        F.concat(F.lit("ev-"), F.lpad(F.col("id").cast("string"), 8, "0"))
         .alias("eventId"),
        F.element_at(type_arr, (F.pmod(F.col("id") * 2654435761, F.lit(6))
                                + 1).cast("int")).alias("eventType"),
        F.timestamp_seconds(
            F.lit(base_ts) + F.pmod(F.col("id") * 48271, F.lit(span_s))
        ).alias("timestamp"),
        F.concat(F.lit("emp-"),
                 F.lpad(F.pmod(F.col("id") * 69621, F.lit(500))
                        .cast("string"), 4, "0")).alias("aggregateId"),
        F.lit("employee").alias("aggregateType"),
        F.lit(1).alias("version"),
        F.lit("{}").alias("payload"),
        F.create_map(F.lit("k"), F.lit("v")).alias("metadata"),
    )


def _parquet_files(d):
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def test_optimize_zorder_three_dims_on_event_store(spark, tmp_path):
    path = str(tmp_path / "hr_events")
    store.append_events(_envelopes(spark, 8000, _JAN, 28 * 86400), path)
    store.append_events(_envelopes(spark, 300, _FEB, 86400), path)

    jan, feb = f"{path}/event_month=202601", f"{path}/event_month=202602"
    before_jan = spark.read.parquet(jan).collect()
    feb_files_before = _parquet_files(feb)

    done = store.optimize_zorder(
        spark, path,
        dims=["event_type", "event_timestamp", "aggregate_id"],
        keep_open_months=1, files_per_month=64)

    # only the closed month is rewritten; the open month is untouched
    assert done == ["202601"]
    assert _parquet_files(feb) == feb_files_before
    assert len(_parquet_files(jan)) == 64

    # no row lost/duplicated, no schema change, no helper column leaked
    after = spark.read.parquet(jan)
    assert sorted(after.columns) == sorted(
        c for c in spark.read.parquet(feb).columns)
    assert after.count() == len(before_jan)
    assert (after.select("event_id").distinct().count()
            == len({r.event_id for r in before_jan}))

    st = file_minmax_stats(
        jan, ["event_type", "event_timestamp", "aggregate_id"])

    # 1) event-type equality probe: a middle type lives in one z-stripe
    t = "EmployeeTerminated"
    skip_type = skipped_fraction(st, "event_type", t, t)
    assert skip_type >= 0.5, skip_type

    # 2) a ~5% time-range probe inside the month
    lo = min(s["event_timestamp_min"] for s in st)
    hi = max(s["event_timestamp_max"] for s in st)
    width = (hi - lo) / 20
    mid = lo + (hi - lo) / 2
    skip_ts = skipped_fraction(st, "event_timestamp", mid, mid + width)
    assert skip_ts >= 0.5, skip_ts

    # 3) aggregate-id equality probe (dictionary-coded string dim)
    a = "emp-0250"
    skip_agg = skipped_fraction(st, "aggregate_id", a, a)
    assert skip_agg >= 0.5, skip_agg


def test_optimize_zorder_all_months_closed_when_zero_open(spark, tmp_path):
    path = str(tmp_path / "hr_events")
    store.append_events(_envelopes(spark, 500, _JAN, 86400), path)
    store.append_events(_envelopes(spark, 500, _FEB, 86400), path)
    done = store.optimize_zorder(
        spark, path, dims=["event_type", "event_timestamp"],
        keep_open_months=0, files_per_month=4)
    assert done == ["202601", "202602"]
    for m in done:
        assert len(_parquet_files(f"{path}/event_month={m}")) == 4


def test_optimize_zorder_string_cardinality_guard(spark, tmp_path):
    import pytest

    path = str(tmp_path / "hr_events")
    store.append_events(_envelopes(spark, 400, _JAN, 86400), path)
    store.append_events(_envelopes(spark, 10, _FEB, 86400), path)
    with pytest.raises(ValueError, match="distinct values"):
        store.optimize_zorder(spark, path, dims=["event_id", "event_type"],
                              keep_open_months=1, max_codes=10)


def test_optimize_zorder_skips_everything_when_open_exceeds_months(
        spark, tmp_path):
    path = str(tmp_path / "hr_events")
    store.append_events(_envelopes(spark, 200, _JAN, 86400), path)
    before = _parquet_files(f"{path}/event_month=202601")
    done = store.optimize_zorder(spark, path,
                                 dims=["event_type", "event_timestamp"],
                                 keep_open_months=3)
    assert done == []
    assert _parquet_files(f"{path}/event_month=202601") == before


def test_optimize_zorder_staging_never_inside_store_root(spark, tmp_path,
                                                         monkeypatch):
    """A crash mid-rewrite must not leave a dir that Spark partition
    discovery or the month glob would mistake for a real month."""
    import debezium_nats_cdc_spark.store as store_mod

    path = str(tmp_path / "hr_events")
    store.append_events(_envelopes(spark, 300, _JAN, 86400), path)
    store.append_events(_envelopes(spark, 50, _FEB, 86400), path)

    seen = []
    real = store_mod.zorder_write

    def spy(df, dims, p, **kw):
        seen.append(p)
        real(df, dims, p, **kw)
        raise RuntimeError("crash after staging write")

    monkeypatch.setattr(store_mod, "zorder_write", spy)
    try:
        store.optimize_zorder(spark, path,
                              dims=["event_type", "event_timestamp"],
                              keep_open_months=1)
    except RuntimeError:
        pass
    assert seen and all(not s.startswith(path + "/") for s in seen)
    # the store itself still reads exactly the original rows
    assert spark.read.parquet(path).count() == 350
    # and a re-run heals: the leftover staging dir is cleared, months
    # glob still sees only the real months
    monkeypatch.setattr(store_mod, "zorder_write", real)
    done = store.optimize_zorder(spark, path,
                                 dims=["event_type", "event_timestamp"],
                                 keep_open_months=1)
    assert done == ["202601"]
    assert spark.read.parquet(path).count() == 350


def test_read_events_pruned_pushes_all_three_predicates(spark, tmp_path):
    from datetime import datetime, timezone

    from debezium_nats_cdc_spark.plans.explain import formatted_plan

    path = str(tmp_path / "hr_events")
    store.append_events(_envelopes(spark, 2000, _JAN, 28 * 86400), path)
    store.append_events(_envelopes(spark, 2000, _FEB, 28 * 86400), path)
    store.optimize_zorder(
        spark, path,
        dims=["event_type", "event_timestamp", "aggregate_id"],
        keep_open_months=0, files_per_month=8)

    lo = datetime(2026, 1, 5, tzinfo=timezone.utc)
    hi = datetime(2026, 1, 12, tzinfo=timezone.utc)
    df = store.read_events_pruned(
        spark, path,
        event_types=["EmployeeHired"],
        ts_range=(lo.isoformat(), hi.isoformat()),
        aggregate_ids=None)

    plan = formatted_plan(df)
    # month partition pruning + pushed scan filters on both columns
    assert "PushedFilters" in plan
    for frag in ("event_type", "event_timestamp"):
        assert frag in plan.split("PushedFilters")[1].split("]")[0], frag
    # February pruned at the DIRECTORY level: partition filters mention
    # event_month, and the result matches a manual filter
    assert "event_month" in plan

    manual = (spark.read.parquet(path)
              .filter((F.col("event_type") == "EmployeeHired")
                      & F.col("event_timestamp").between(
                          F.lit(lo.isoformat()).cast("timestamp"),
                          F.lit(hi.isoformat()).cast("timestamp"))))
    assert df.count() == manual.count() > 0
    assert df.select(F.max("event_month")).first()[0] == "202601"
