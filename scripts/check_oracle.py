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

from dataflow_flex_templates_spark.testing.oracle import (  # noqa: E402
    canon,
    compare_frames,
)


def main() -> int:
    import __spark_entry__ as e
    from dataflow_flex_templates_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import os
    if (sf_dir.rstrip("/") != e.ORACLE_PINNED_SF_DIR
            and not os.environ.get("SPARK_GRAFT_ORACLE_CONSTANTS")):
        print(f"note: {sorted(e.SF_PINNED_QUERIES)} embed constants "
              f"pinned at {e.ORACLE_PINNED_SF_DIR}; to verify them at "
              f"{sf_dir} regenerate via SPARK_GRAFT_ORACLE_SF_DIR="
              f"{sf_dir} SPARK_GRAFT_ORACLE_CONST_OUT=<tmp> "
              f"scripts/gen_oracle_constants.py and set "
              f"SPARK_GRAFT_ORACLE_CONSTANTS=<tmp>")
    spark = get_spark("oracle-check",
                      cores=int(os.environ.get("SPARK_GRAFT_ORACLE_CPUS",
                                               "8")))
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
        ok, msg = compare_frames(spark_pdf, oracle_pdf)
        if not ok:
            failed.append((name, msg))
        print(f"  {name:28s} rows={len(spark_pdf):7d} "
              f"oracle={len(oracle_pdf):7d}  {'OK ' if ok else 'FAIL'}")
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
