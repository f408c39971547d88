"""Custom stateful streaming operator (SURVEY §2.J escape hatch).

The reference's extension point is arbitrary user Java implementing
EventTransformer (docs/design.md:283-307).  All 13 built-in rules are
pure column expressions (operators/rules.py); this module is the
documented escape hatch for transforms that genuinely need per-key
state across micro-batches: ``applyInPandasWithState``.

Demo operator: per-employee salary change tracker — keeps (last_salary,
n_changes, total_delta) per key and emits one row per observed change
with the running totals.  Arrow-batched; state is a small tuple per key;
keys are hash-partitioned so state scales with executors.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("employee_id", T.LongType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("salary", T.DoubleType()),
    T.StructField("prev_salary", T.DoubleType()),
    T.StructField("n_changes", T.LongType()),
    T.StructField("total_delta", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("last_salary", T.DoubleType()),
    T.StructField("n_changes", T.LongType()),
    T.StructField("total_delta", T.DoubleType()),
])


def _track(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (employee_id,) = key
    last_salary, n_changes, total_delta = (
        state.get if state.exists else (None, 0, 0.0)
    )
    rows = []
    batch = pd.concat(list(pdfs)).sort_values("ts_ms")
    for r in batch.itertuples(index=False):
        sal = float(r.salary)
        if last_salary is not None and sal != last_salary:
            n_changes += 1
            total_delta += sal - last_salary
            rows.append((employee_id, int(r.ts_ms), sal, last_salary,
                         n_changes, total_delta))
        last_salary = sal
    state.update((last_salary, n_changes, total_delta))
    if rows:
        yield pd.DataFrame(rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def salary_change_tracker(unwrapped_employees: DataFrame) -> DataFrame:
    """Stateful per-key tracker over an employees change stream.

    Input: unwrapped envelopes (operators/unwrap.py).  Works on a
    streaming DataFrame; state persists across micro-batches via the
    state store (checkpointed)."""
    src = unwrapped_employees.filter(F.col("after").isNotNull()).select(
        F.col("after.id").alias("employee_id"),
        F.col("ts_ms"),
        F.col("after.salary").cast("double").alias("salary"),
    )
    return src.groupBy("employee_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
