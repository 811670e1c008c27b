"""Differential harness: run a Spark query and its DuckDB oracle on the
same parquet tables and compare (row count, column names, sorted
values) — a local mirror of the driver's CORRECTNESS check, so every
registered query is verified before the driver ever sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from chronobase_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all
    columns, positional index."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    a, b = _canon(spdf), _canon(oracle_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"{name}: columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"{name}: row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(av, bv))
            if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"{name}.{col}: {len(bad)}/{len(av)} values differ; "
                f"first at row {i}: spark={x!r} duck={y!r}"
            )
    return problems
