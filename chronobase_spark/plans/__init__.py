"""Plan inspection helpers (100 TB posture checks)."""

from chronobase_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema,
)
