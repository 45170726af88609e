"""Shared Spark-vs-DuckDB comparison kernel.

One implementation of the driver's correctness gate (row count +
column names + order-insensitive value multiset, floats rounded to 4
places) used by BOTH the ad-hoc sweep script (scripts/check_oracle.py)
and the per-query pytest board guard (tests/test_board.py), so the
board can't rot between driver samples without CI turning red.
"""

from __future__ import annotations

import pandas as pd


def canon(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive canonical form: columns sorted by name, floats
    rounded to 4 places, numpy scalars unboxed, rows sorted by repr —
    the same normalization the driver's value-hash applies."""
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


def compare_frames(spark_pdf: pd.DataFrame,
                   oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    """(ok, message). Checks column-name sets then the canonical value
    multiset; the message carries up to 3 sample rows from each side's
    difference for diagnosis."""
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        return False, f"schema mismatch: spark={sc} oracle={oc}"
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if a == b:
        return True, f"{len(a)} rows match"
    diff_a = [r for r in a if r not in set(b)][:3]
    diff_b = [r for r in b if r not in set(a)][:3]
    return False, (f"{len(a)} spark vs {len(b)} oracle rows; "
                   f"spark-only={diff_a} oracle-only={diff_b}")
