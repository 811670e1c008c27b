"""Query operators.

Each module re-expresses a slice of the reference's capability surface
(SURVEY.md §2) as declarative DataFrame transformations so Catalyst can
push filters into the Parquet scan, prune columns, and pick physical join
strategies. Nothing in here collects to the driver.
"""

from chronobase_spark.operators import (  # noqa: F401
    aggregates,
    joins,
    setops,
    timeseries,
    windows,
)
