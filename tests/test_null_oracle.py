"""Null-injected ORACLE differential: every oracle-checked query must
match DuckDB on a corpus where ~20% of every nullable non-key column is
NULL — not merely execute (tests/test_empty_inputs.py), but produce the
same answer.

Why this gate exists: Spark and DuckDB disagree on null DEFAULTS in
exactly the places a query is still correct on clean data — ascending
ORDER BY/window order (Spark NULLS FIRST, DuckDB NULLS LAST), struct-min
argmin (Spark sorts null fields first; DuckDB arg_min skips null
values), aggregate-vs-scalar null propagation. The round-7 sweep that
introduced this test found 15 of 137 queries silently diverging under
NULLs; each now pins an explicit null contract (asc_nulls_last /
NULLS LAST, up-front null drops, coalesced token counts) on BOTH
engines, and this test keeps the class closed.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from chronobase_spark import catalog  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402

# Queries whose null behavior is protected by the INGEST contract
# rather than pinned cross-engine, each with the reason. Keep minimal:
# an entry here is a hole in the gate.
_CONTRACT_EXCLUDED = {
    # payload is produced by the engine's own multimodal writer and is
    # non-null by construction; decoding a NULL payload is undefined
    # (Spark's Arrow batch sees None, the oracle's meta math sees NULL)
    "multimodal_decode_features",
    "multimodal_resize_meta",
}

# identity/join columns a (key, ts) store may assume non-null —
# the same contract set as tests/test_empty_inputs.py's nully fixture
_KEEP = {
    "event_id", "ts", "user_id", "doc_id", "vec_id", "label",
    "o_orderkey", "o_custkey", "c_custkey", "c_nationkey",
    "n_nationkey", "n_regionkey", "r_regionkey", "s_suppkey",
    "s_nationkey", "p_partkey", "l_orderkey", "l_partkey",
    "l_suppkey", "l_linenumber", "event_date",
}


@pytest.fixture(scope="module")
def nully_file_sf_dir(spark, tmp_path_factory):
    """Smoke corpus with ~20% NULLs in every nullable non-key column,
    written as one parquet FILE per table (duck_connection reads
    per-file paths, not Spark part directories). Deterministic via
    xxhash64."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    root = tmp_path_factory.mktemp("sf_nully_oracle")
    for t in catalog.TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        for c in df.columns:
            if c in _KEEP:
                continue
            df = df.withColumn(
                c,
                F.when(
                    F.pmod(
                        F.xxhash64(F.lit(c), F.monotonically_increasing_id()), 5
                    )
                    != 0,
                    F.col(c),
                ),
            )
        pq.write_table(df.toArrow(), str(root / f"{t}.parquet"))
    return str(root)


def test_oracle_matches_under_nulls(spark, nully_file_sf_dir):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duck_connection(nully_file_sf_dir)
    failures: list[str] = []
    for name in sorted(oracles):
        if name in _CONTRACT_EXCLUDED:
            continue
        try:
            problems = compare(
                qs[name](spark, nully_file_sf_dir),
                con.execute(oracles[name]).fetchdf(),
                name,
            )
        except Exception as exc:  # noqa: BLE001 — collecting the sweep
            problems = [f"{name}: {type(exc).__name__}: {exc}"[:200]]
        failures.extend(problems)
    assert not failures, (
        f"{len(failures)} oracle queries diverge under NULLs:\n"
        + "\n".join(failures)
    )


@pytest.fixture(scope="module")
def empty_file_sf_dir(spark, tmp_path_factory):
    """Zero-row corpus with exact schemas, one parquet FILE per table
    (duck_connection reads per-file paths)."""
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("sf_empty_oracle")
    for t in catalog.TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").limit(0)
        pq.write_table(df.toArrow(), str(root / f"{t}.parquet"))
    return str(root)


def test_oracle_matches_on_empty_corpus(spark, empty_file_sf_dir):
    """Every oracle-checked query must VALUE-match DuckDB on a zero-row
    corpus — the regime where engines disagree on global-aggregate
    semantics (does an ungrouped aggregate emit one NULL/0 row or no
    row?) and where tests/test_empty_inputs.py only proves execution.
    Empty partitions, new tenants, and over-filtered sub-corpora make
    this the steady state of a 100 TB deployment, not an edge case."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duck_connection(empty_file_sf_dir)
    failures: list[str] = []
    for name in sorted(oracles):
        if name in _CONTRACT_EXCLUDED:
            continue
        try:
            problems = compare(
                qs[name](spark, empty_file_sf_dir),
                con.execute(oracles[name]).fetchdf(),
                name,
            )
        except Exception as exc:  # noqa: BLE001 — collecting the sweep
            problems = [f"{name}: {type(exc).__name__}: {exc}"[:200]]
        failures.extend(problems)
    assert not failures, (
        f"{len(failures)} oracle queries diverge on the empty corpus:\n"
        + "\n".join(failures)
    )
