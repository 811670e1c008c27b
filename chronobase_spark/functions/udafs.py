"""Custom aggregation (UDAF) extension point: grouped-agg pandas UDFs.

NOTE: no ``from __future__ import annotations`` here — pandas-UDF eval
type is inferred from the *evaluated* type hints (pd.Series -> scalar
= grouped agg), and stringified annotations break that inference.

Built-ins cover every aggregate this engine ships (including exact
percentiles); this module pins the mechanism for aggregations Spark
cannot express — custom sketches, model scoring, domain statistics —
Arrow-batched per group, never row-at-a-time.
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Exact interpolated median per group ((a+b)/2 between the two
    middle doubles — deterministic, matches DuckDB quantile_cont(0.5))."""
    return round(float(v.median()), 6)
