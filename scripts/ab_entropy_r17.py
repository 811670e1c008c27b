"""Interleaved A/B for char_entropy: old per-distinct-char scan vs new
RLE fold, each plain and spread. Usage: ab_entropy_r17.py [sf] [rounds]."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import spread, table
from chronobase_spark.functions import text as T

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def old_char_entropy(text: Column) -> Column:
    cs = F.filter(F.split(text, ""), lambda c: c != F.lit(""))

    def ent(chars: Column) -> Column:
        counts = F.transform(
            F.array_sort(F.array_distinct(chars)),
            lambda c: F.size(F.filter(chars, lambda x: x == c)),
        )
        n = F.size(chars).cast("double")
        s = F.aggregate(
            counts,
            F.lit(0.0),
            lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")),
        )
        return F.when(
            n > 0,
            F.round((F.log(n) - s / n) * F.lit(1000000.0), 0).cast("bigint"),
        )

    return F.get(F.transform(F.array(cs), ent), 0)


def main():
    spark = get_spark(app_name="ab-entropy-r17", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    docs = table(spark, SF_DIR, "documents")
    docs.collect()

    variants = {
        "old/plain": lambda: docs.select("doc_id", old_char_entropy(F.col("text")).alias("e")),
        "old/spread": lambda: spread(docs, key="doc_id").select("doc_id", old_char_entropy(F.col("text")).alias("e")),
        "new/plain": lambda: docs.select("doc_id", T.char_entropy(F.col("text")).alias("e")),
        "new/spread": lambda: spread(docs, key="doc_id").select("doc_id", T.char_entropy(F.col("text")).alias("e")),
    }
    # equivalence pin first
    a = variants["old/plain"]().collect()
    b = variants["new/plain"]().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "VALUES DIFFER"
    print("values identical:", len(a), "rows")

    results: dict[str, list[float]] = {k: [] for k in variants}
    for name, build in variants.items():
        build().write.format("noop").mode("overwrite").save()
    for r in range(ROUNDS):
        for name, build in variants.items():
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        ts_s = sorted(ts)
        med = ts_s[len(ts_s) // 2]
        print(f"{name:12} min {min(ts):6.3f}  med {med:6.3f}  all "
              + " ".join(f"{t:.2f}" for t in ts))
    spark.stop()


if __name__ == "__main__":
    main()
