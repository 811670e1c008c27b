"""r18 systematic sweep: compile every registered query's physical plan
and flag Filter conditions that embed HEAVY expressions (md5 / xxhash /
conv / per-gram transform chains) — the guide-§4.4-shaped duplication
family N fixed for shingle_table/winnow_fingerprints, hunted across the
whole registry. Driver-side only (no jobs).

Usage: python scripts/scan_filter_dup_r18.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronobase_spark import get_spark
from chronobase_spark import queries as q

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
HEAVY = ("md5(", "xxhash64(", "conv(", "aggregate(", "sha2(")
# a filter condition is "suspicious" when it is very long (embedded
# expression tree) or contains a heavy hash/fold call
LEN_FLOOR = 400


def main():
    spark = get_spark(app_name="scan-filter-dup", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.queries()
    hits = 0
    for name in sorted(reg):
        try:
            df = reg[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            print(f"{name}: PLAN ERROR {type(exc).__name__}: {exc}"[:160])
            continue
        # formatted details: "(n) Filter\n[codegen...]\nInput ...\nCondition : <expr>"
        for m in re.finditer(r"^Condition : (.*)$", plan, re.MULTILINE):
            cond = m.group(1)
            heavy = [h for h in HEAVY if h in cond]
            if heavy or len(cond) > LEN_FLOOR:
                hits += 1
                print(f"{name}: len={len(cond)} heavy={heavy} :: {cond[:130]}")
        spark.catalog.clearCache()
    print(f"done: {hits} suspicious filter conditions")
    spark.stop()


if __name__ == "__main__":
    main()
