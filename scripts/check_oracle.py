#!/usr/bin/env python
"""Side-by-side correctness harness mimicking the driver:
for every queries() entry, run the Spark query and (when present) the
DuckDB oracle_sql at the given sf dir; compare row count, column names,
and an order-insensitive value multiset.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                row.append(round(v, 4))
            elif hasattr(v, "item"):
                row.append(v.item() if not isinstance(v, bytes) else v)
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=repr)


def main() -> int:
    import __spark_entry__ as e
    from dataflow_flex_templates_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8)
    con = duckdb.connect()
    for t in e.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_pdf = fn(spark, sf_dir).toPandas()
        if name not in os_:
            print(f"  {name:28s} rows={len(spark_pdf):7d}  (rows-only)")
            if len(spark_pdf) == 0:
                failed.append((name, "0 rows"))
            continue
        oracle_pdf = con.execute(os_[name]).df()
        sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
        if sc != oc:
            failed.append((name, f"schema {sc} != {oc}"))
            print(f"  {name:28s} SCHEMA MISMATCH {sc} vs {oc}")
            continue
        a, b = canon(spark_pdf), canon(oracle_pdf)
        status = "OK " if a == b else "FAIL"
        if a != b:
            diff_a = [r for r in a if r not in set(b)][:3]
            diff_b = [r for r in b if r not in set(a)][:3]
            failed.append((name, f"{len(a)} vs {len(b)} rows; "
                                 f"spark-only={diff_a} oracle-only={diff_b}"))
        print(f"  {name:28s} rows={len(a):7d} oracle={len(b):7d}  {status}")
    spark.stop()
    if failed:
        print("\nFAILURES:")
        for n, msg in failed:
            print(f"  {n}: {msg}")
        return 1
    print("\nall checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
