"""DuckDB-parity coverage for queries deferred past the driver window.

The grading driver verifies only the first ``DRIVER_CHECK_WINDOW`` registry
entries; rows in ``DEFER_TO_TAIL`` get no driver correctness row that round.
This test runs exactly those deferred queries through the same
rowcount/schema/value-hash comparison the driver uses (via
tools/check_oracle.py helpers) so a regression in a deferred query fails
pytest locally instead of going dark until the rotation brings it back.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tools"))

import __spark_entry__ as E  # noqa: E402
from check_oracle import TABLES, type_guard, value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", E.DEFER_TO_TAIL)
def test_deferred_query_matches_oracle(spark, duck, name):
    qs, oracles = E.queries(), E.oracle_sql()
    assert name in qs, f"DEFER_TO_TAIL names unknown query {name}"
    assert name in oracles, f"deferred query {name} has no oracle"
    assert not type_guard(duck, {name: oracles[name]})

    sdf = qs[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracles[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert len(s_rows) == len(d_rows)
    assert sorted(s_cols) == sorted(d_cols)
    assert value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
