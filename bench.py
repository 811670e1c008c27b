"""Benchmark harness: time every registered query at the bench scale
factor and emit ONE JSON line the driver records as BENCH_r{N}.json.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Each query executes end-to-end into a no-op sink (full plan runs on the
executors, nothing materializes on the driver) — the honest measure of
distributed execution cost, not collect() serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chronobase_spark import get_spark  # noqa: E402
from chronobase_spark import queries as q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def run() -> dict:
    spark = get_spark(app_name="chronobase-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    # Warm the JVM + parquet footer caches once so per-query numbers
    # measure the queries, not session bootstrap.
    q.flagship(spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in q.queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # one bad query must not kill the bench
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "cpus": CPUS,
    }
    if errors:
        result["errors"] = errors
    spark.stop()
    return result


if __name__ == "__main__":
    print(json.dumps(run()))
