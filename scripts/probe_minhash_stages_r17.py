"""Stage-component probe for minhash_md5_pairs (r17, guide §1):
time each pipeline prefix into the noop sink, min-of-N, cache cleared
between reps, so the next optimization targets the measured stage, not
a guess.

Usage: python scripts/probe_minhash_stages_r17.py [sf_dir] [rounds]
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
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def bench(spark, name, make_df):
    times = []
    for _ in range(ROUNDS):
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(f"{name:32s} min {min(times):6.2f}  all {[round(t,2) for t in times]}")


def main():
    spark = get_spark(app_name="probe-minhash", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    docs = table(spark, SF_DIR, "documents")

    def shingle_only():
        return minhash.shingle_table(docs)

    def sig_lanes():
        sh = minhash.shingle_table(docs)
        exploded = sh.select("doc", F.explode("sh").alias("_g"))
        lanes = [
            F.min(minhash.md5_lane(F.col("_g"), i)).alias(f"_m{i}")
            for i in range(16)
        ]
        return exploded.groupBy("doc").agg(*lanes)

    def band_table():
        sh = minhash.shingle_table(docs).persist()
        return minhash.md5_band_table_from_shingles(sh, 4, 4)

    def cands():
        sh = minhash.shingle_table(docs).persist()
        banded = minhash.md5_band_table_from_shingles(sh, 4, 4)
        a = banded.alias("a")
        b = banded.hint("shuffle_hash").alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .distinct()
        )

    def full():
        return minhash.minhash_md5_pairs(docs, threshold=0.5)

    for name, fn in [
        ("shingle_table", shingle_only),
        ("sig_16_lanes", sig_lanes),
        ("band_table", band_table),
        ("band_join_cands", cands),
        ("full_md5_pairs", full),
    ]:
        bench(spark, name, fn)
    spark.stop()


if __name__ == "__main__":
    main()
