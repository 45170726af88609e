"""Board-rot guard: EVERY ``queries()``/``oracle_sql()`` pair runs in
CI against DuckDB at sf0.001 (the smoke tier).

The driver samples ~50 of the board's queries per round; without this
module the unsampled rows are only verified when a judge runs them by
hand, so a board entry can silently rot between rounds. Here each pair
is its own parametrized test using the exact comparison kernel the
sweep script uses (``testing/oracle.py``): row count + column names +
order-insensitive value multiset, floats rounded to 4 places.
Oracle-less entries (streaming state, LSH approximations, audio
decode) get the driver's weaker rows-only check — their exact
semantics are pinned by the dedicated unit tests.

Set ``SPARK_GRAFT_BOARD_SF_DIR`` to sweep a different tier (e.g.
/root/testdata/sf0.1) with the same harness.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from dataflow_flex_templates_spark.testing.oracle import compare_frames

BOARD_SF_DIR = os.environ.get("SPARK_GRAFT_BOARD_SF_DIR",
                              "/root/testdata/sf0.001")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def _connect(sf_dir: str):
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def oracle_con():
    con = _connect(BOARD_SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="module")
def oracle_con_pinned():
    """SF_PINNED_QUERIES oracles embed constants generated from
    ORACLE_PINNED_SF_DIR's text/embedding payloads — those pairs must
    run at that sf (exactly as the driver does)."""
    con = _connect(entry_mod.ORACLE_PINNED_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_board_query_matches_oracle(name, spark, oracle_con,
                                    oracle_con_pinned):
    pinned = name in entry_mod.SF_PINNED_QUERIES
    sf_dir = entry_mod.ORACLE_PINNED_SF_DIR if pinned else BOARD_SF_DIR
    spark_pdf = _QUERIES[name](spark, sf_dir).toPandas()
    if name not in _ORACLES:
        # driver's rows-only fallback for non-SQL-expressible ops
        assert len(spark_pdf) > 0, f"{name}: 0 rows (rows-only check)"
        return
    con = oracle_con_pinned if pinned else oracle_con
    oracle_pdf = con.execute(_ORACLES[name]).df()
    ok, msg = compare_frames(spark_pdf, oracle_pdf)
    assert ok, f"{name}: {msg}"


def test_board_is_fully_oracled():
    """Every board entry has an oracle and every oracle has a query —
    additions must come WITH an oracle (the board is 122/122 oracled
    as of round 3; keep it that way)."""
    assert sorted(_QUERIES) == sorted(_ORACLES)
