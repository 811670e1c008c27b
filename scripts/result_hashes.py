"""Collect order-insensitive result hashes for named queries — the
before/after equivalence pin for optimization work: an optimization
must leave every query's rows byte-identical, so hash the canonical
(sorted rows, sorted columns, repr-canonical scalars) form before and
after and diff.

Usage: python scripts/result_hashes.py out.json [sf_dir] [query ...]
       (no query names = the full registry)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from chronobase_spark import get_spark
from chronobase_spark import queries as q

OUT = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
NAMES = sys.argv[3:]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from oracle_harness import _canon, _canon_str  # tests/oracle_harness.py

    spark = get_spark(app_name="result-hashes", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    reg = q.queries()
    names = NAMES or sorted(reg)
    out = {}
    for name in names:
        try:
            pdf = _canon(reg[name](spark, SF_DIR).toPandas())
            h = hashlib.md5()
            h.update(("|".join(pdf.columns)).encode())
            for row in pdf.itertuples(index=False):
                h.update(("\x1f".join(_canon_str(v) for v in row)).encode())
            out[name] = {"rows": len(pdf), "hash": h.hexdigest()}
        except Exception as exc:
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        finally:
            spark.catalog.clearCache()
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    n_err = sum(1 for v in out.values() if "error" in v)
    print(f"wrote {len(out)} hashes to {OUT} ({n_err} errors)")
    spark.stop()


if __name__ == "__main__":
    main()
