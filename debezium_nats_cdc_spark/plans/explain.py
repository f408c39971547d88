"""Physical-plan assertions (SURVEY.md §4 discipline).

The scale contract for every operator — filters reach the parquet scan,
dimensions broadcast, nothing silently falls back to a cartesian product
— is checkable from ``explain("formatted")`` output.  These helpers turn
that discipline into unit tests (tests/test_plans.py) so a regression in
plan shape fails CI, not a 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the scan (PushedFilters: [...])."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    if not any(fragment in ln for ln in pushed):
        raise AssertionError(
            f"filter {fragment!r} not pushed to scan.\nPushed lines: {pushed}\n{plan}"
        )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    """Assert the plan contains >= N broadcast hash joins."""
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    if n < at_least:
        raise AssertionError(f"expected >= {at_least} BroadcastHashJoin, got {n}\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert no CartesianProduct / unconditioned nested-loop join."""
    plan = formatted_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"plan contains CartesianProduct\n{plan}")


def scan_columns(df: DataFrame, table_fragment: str) -> list[str]:
    """Columns actually read from a scan (ReadSchema) — column-pruning check."""
    plan = formatted_plan(df)
    cols: list[str] = []
    # the node header says only "Scan parquet"; the table shows up in the
    # Location: line of the same block — match block-wise
    grab = False
    for ln in plan.splitlines():
        if "Location" in ln and table_fragment in ln:
            grab = True
        elif grab and "ReadSchema" in ln:
            schema = ln.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            depth = 0
            cur = ""
            for ch in inner:
                if ch == "," and depth == 0:
                    cols.append(cur.split(":", 1)[0].strip())
                    cur = ""
                    continue
                if ch in "<([":
                    depth += 1
                if ch in ">)]":
                    depth -= 1
                cur += ch
            if cur:
                cols.append(cur.split(":", 1)[0].strip())
            break
    return cols


def count_exchanges(plan_or_df) -> int:
    """Number of Exchange nodes (shuffles) in a formatted plan.  The
    single point of truth for the '^(N) Exchange' layout assumption —
    accepts a DataFrame or an already-formatted plan string."""
    import re

    plan = (plan_or_df if isinstance(plan_or_df, str)
            else formatted_plan(plan_or_df))
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
