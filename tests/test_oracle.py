"""Differential correctness: every registered query with an oracle must
match DuckDB exactly (row count + columns + values) — the local mirror
of the driver's t2 gate. Runs at sf0.001 for speed; the driver runs the
same comparison at sf0.01.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import SF_ORACLE, SF_SMOKE  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402

SF = os.environ.get("ORACLE_SF_DIR", SF_SMOKE)

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(spark, name):
    con = duck_connection(SF)
    oracle = con.execute(_ORACLES[name]).fetchdf()
    result = _QUERIES[name](spark, SF)
    problems = compare(result, oracle, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle must at least execute and have a stable
    schema (driver's weaker rows-only check)."""
    df = _QUERIES[name](spark, SF)
    assert df.columns
    df.limit(5).collect()
