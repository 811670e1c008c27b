"""Interleaved A/B for the r17 union-identity rewrite: exact-Jaccard
verify via size(array_union) (old) vs |A|+|B|−|A∩B| on the distinct
shingle arrays (new, current code). Old variant reconstructed inline so
both run in ONE session, alternating, min-of-N (the round's ambient-load
methodology).

Usage: python scripts/ab_union_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import table
from chronobase_spark.dedup import minhash

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def md5_pairs_old(df, threshold=0.5):
    sh = minhash.shingle_table(df).persist()
    banded = minhash.md5_band_table_from_shingles(sh, 4, 4)
    a = banded.alias("a")
    b = banded.hint("shuffle_hash").alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a")).hint(
        "shuffle_hash"
    )
    sb = sh.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b")).hint(
        "shuffle_hash"
    )
    thresh_micro = int(round(threshold * 1_000_000))
    common = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("bigint")
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("_c", common)
        .withColumn("_u", union)
        .filter(F.col("_c") * 1_000_000 >= F.lit(thresh_micro) * F.col("_u"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("_c").cast("double") / F.col("_u").cast("double")).alias(
                "jaccard"
            ),
        )
    )


def main():
    spark = get_spark(app_name="ab-union", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    docs = table(spark, SF_DIR, "documents")
    variants = {
        "old_array_union": lambda: md5_pairs_old(docs),
        "new_size_identity": lambda: minhash.minhash_md5_pairs(docs, threshold=0.5),
    }
    times = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab:{name}:{r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, ts in times.items():
        print(f"{name:20s} min {min(ts):6.2f}  all {[round(t, 2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
