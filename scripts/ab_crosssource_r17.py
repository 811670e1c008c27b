"""Interleaved A/B: cross_source_dup_matrix label attachment — old
(two doc-keyed joins, each shuffling the corpus-sized (doc_id, source)
map) vs melt (pairs exploded to (pair, side, doc) rows, ONE join to
the label map, pivoted back with a pairs-sized aggregate): one corpus
shuffle instead of two, at the price of a 2|pairs|-row agg.

Usage: python scripts/ab_crosssource_r17.py [sf_dir] [rounds]
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


def old_matrix(docs):
    pairs = minhash.minhash_md5_pairs(docs).select("doc_a", "doc_b")
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(sa.hint("shuffle_hash"), "doc_a")
        .join(sb.hint("shuffle_hash"), "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def melt_matrix(docs):
    pairs = minhash.minhash_md5_pairs(docs).select("doc_a", "doc_b")
    melt = pairs.select(
        "doc_a",
        "doc_b",
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("side"), F.col("doc_a").alias("doc_id")),
                F.struct(F.lit("b").alias("side"), F.col("doc_b").alias("doc_id")),
            )
        ).alias("m"),
    ).select("doc_a", "doc_b", "m.side", "m.doc_id")
    src = docs.select("doc_id", "source")
    lab = melt.join(src.hint("shuffle_hash"), "doc_id")
    per_pair = lab.groupBy("doc_a", "doc_b").agg(
        F.max(F.when(F.col("side") == "a", F.col("source"))).alias("src_a"),
        F.max(F.when(F.col("side") == "b", F.col("source"))).alias("src_b"),
    )
    return per_pair.groupBy(
        F.least("src_a", "src_b").alias("source_a"),
        F.greatest("src_a", "src_b").alias("source_b"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


def main():
    spark = get_spark(
        app_name="ab-crosssource-r17",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    docs = table(spark, SF_DIR, "documents")
    docs.collect()

    spark.catalog.clearCache()
    a = sorted(map(tuple, old_matrix(docs).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, melt_matrix(docs).collect()))
    assert a == b, f"mismatch:\n{a}\nvs\n{b}"
    print(f"results identical ({len(a)} rows)")

    variants = {
        "old": lambda: old_matrix(docs),
        "melt": lambda: melt_matrix(docs),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, build in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab xsrc {name} r{r}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        if not ts:
            continue
        ts_s = sorted(ts)
        print(
            f"{name:4} min {min(ts):6.3f}  med {ts_s[len(ts_s) // 2]:6.3f}  all "
            + " ".join(f"{t:.2f}" for t in ts)
        )
    spark.stop()


if __name__ == "__main__":
    main()
