"""Local replica of the driver's t2 correctness gate.

Runs every catalog query on Spark at the given sf_dir, runs its DuckDB
oracle on the same parquet files, and compares:
  - row count
  - schema (column names; dtypes after normalization)
  - order-insensitive value hash (rows sorted, columns sorted by name)

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import math
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
ONLY = [a for a in sys.argv[1:] if "/" not in a]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import decimal

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        # canonical numeric form: repr round-trips; strip decimal formatting
        return format(decimal.Decimal(repr(v)).normalize(), "f")
    if isinstance(v, decimal.Decimal):
        return format(v.normalize(), "f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon(df: pd.DataFrame) -> list[str]:
    df = df[sorted(df.columns)]
    rows = ["|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main() -> int:
    from debezium_nats_cdc_spark.session import get_session
    from debezium_nats_cdc_spark import catalog

    spark = get_session("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    ents = catalog.entries()
    names = [n for n in ents if not ONLY or n in ONLY]
    failures = []
    for name in names:
        e = ents[name]
        t0 = time.time()
        try:
            sdf = e.fn(spark, SF_DIR)
            spark_pd = sdf.toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        t_spark = time.time() - t0
        if e.oracle is None:
            print(f"ok(rows-only) {name}: {len(spark_pd)} rows  [{t_spark:.1f}s]")
            if len(spark_pd) == 0:
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            rel = con.sql(e.oracle)
            cols = [d[0] for d in rel.description]
            duck_pd = pd.DataFrame(rel.fetchall(), columns=cols)
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        ok = True
        if len(spark_pd) != len(duck_pd):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
        sc, dc = sorted(spark_pd.columns), sorted(duck_pd.columns)
        if sc != dc:
            ok = False
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
        if ok:
            a, b = canon(spark_pd), canon(duck_pd)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: value mismatch; first diffs:")
                for x, y in diff:
                    print(f"   spark: {x}\n   duck : {y}")
                if not diff:
                    print(f"   (row sets differ in content beyond zip; lens {len(a)} vs {len(b)})")
        if ok:
            print(f"OK   {name}: {len(spark_pd)} rows  [{t_spark:.1f}s]")
        else:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
