"""Interleaved same-session A/B: old (two independent shingling passes)
vs new (one persisted shingle table) construction of minhash_md5_pairs
and minhash_dedup_pairs. Alternating executions cancel session drift —
consecutive-session probes showed +30% monotone drift on UNCHANGED code.

Usage: python scripts/ab_minhash_r17.py [sf_dir] [rounds]
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
from chronobase_spark.dedup.ngram import shingles

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def old_md5_pairs(df, bands=4, rows_per_band=4, n=3, threshold=0.5):
    """The pre-r17 pipeline, verbatim: unconditional repartition,
    band table and shingle table each shingling the corpus."""
    num_perm = bands * rows_per_band
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    exploded = spread.select(
        F.col("doc_id").alias("doc"),
        F.explode(shingles(F.col("text"), n)).alias("_g"),
    )
    lanes = [
        F.min(minhash.md5_lane(F.col("_g"), i)).alias(f"_m{i}")
        for i in range(num_perm)
    ]
    sigs = exploded.groupBy("doc").agg(*lanes).persist()
    key_arr = minhash.md5_band_key(
        [F.col(f"_m{i}") for i in range(num_perm)], bands, rows_per_band
    )
    banded = sigs.select("doc", F.explode(key_arr).alias("b")).select(
        "doc", "b.band_id", "b.band_val"
    )
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
    spread2 = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = spread2.select(
        F.col("doc_id").alias("doc"), shingles(F.col("text"), n).alias("sh")
    ).filter(F.size("sh") > 0)
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


def old_dedup_pairs(df, num_perm=128, bands=16, rows_per_band=8, n=3,
                    threshold=0.5):
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sigs = minhash.minhash_signature(spread, "text", "doc_id", num_perm, n).persist()
    cands = minhash.lsh_candidates(sigs, bands, rows_per_band)
    sh = spread.select(
        F.col("doc_id").alias("doc"),
        shingles(F.col("text"), n).alias("_sh"),
    ).filter(F.size("_sh") > 0).persist()
    a = sh.select(F.col("doc").alias("doc_a"), F.col("_sh").alias("sh_a")).hint(
        "shuffle_hash"
    )
    b = sh.select(F.col("doc").alias("doc_b"), F.col("_sh").alias("sh_b")).hint(
        "shuffle_hash"
    )
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def main():
    spark = get_spark(app_name="ab-minhash-r17", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    docs = table(spark, SF_DIR, "documents")
    docs.collect()

    variants = {
        "md5/old": lambda: old_md5_pairs(docs),
        "md5/new": lambda: minhash.minhash_md5_pairs(docs, threshold=0.5),
        "xx/old": lambda: old_dedup_pairs(docs),
        "xx/new": lambda: minhash.minhash_dedup_pairs(docs, threshold=0.5),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    # one throwaway warmup each
    for name, build in variants.items():
        spark.catalog.clearCache()
        build().write.format("noop").mode("overwrite").save()
    for r in range(ROUNDS):
        for name, build in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab {name} r{r}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    for name, ts in results.items():
        ts_s = sorted(ts)
        med = ts_s[len(ts_s) // 2]
        print(f"{name:10} min {min(ts):6.3f}  med {med:6.3f}  all "
              + " ".join(f"{t:.2f}" for t in ts))
    spark.stop()


if __name__ == "__main__":
    main()
