"""Dump `.explain("formatted")` for named queries to plans/r18/ —
the judge-checkable before/after plan evidence for the r18
optimization round.

Usage: python scripts/dump_plans_r18.py <suffix> <query> [query ...]
e.g.   python scripts/dump_plans_r18.py before ngram_jaccard_pairs
writes plans/r18/ngram_jaccard_pairs_before.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronobase_spark import get_spark
from chronobase_spark import queries as q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans-r18", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    reg = q.queries()
    for name in names:
        df = reg[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
