"""Interleaved same-session A/B: old minhash_lsh_recall shape (truth
and found finders each tokenize+shingle the corpus independently) vs
new (both feed from ONE persisted shingle table via the
*_from_shingles entry points). Alternating executions cancel session
drift (the r17 methodology).

Usage: python scripts/ab_lshrecall_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import table
from chronobase_spark.dedup import minhash, ngram

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _metrics(truth, found):
    t = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    f_ = found.agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
    c = truth.join(found, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common")
    )
    return (
        t.crossJoin(f_)
        .crossJoin(c)
        .select(
            "n_truth",
            "n_found",
            "n_common",
            F.when(
                F.col("n_truth") > 0,
                F.col("n_common").cast("double") / F.col("n_truth").cast("double"),
            ).alias("lsh_recall"),
            F.when(
                F.col("n_found") > 0,
                F.col("n_common").cast("double") / F.col("n_found").cast("double"),
            ).alias("lsh_precision"),
        )
    )


def old_recall(docs):
    """Pre-change shape: each finder builds its own shingle table."""
    truth = ngram.jaccard_pairs(docs, threshold=0.5, max_df=50).select(
        "doc_a", "doc_b"
    )
    found = minhash.minhash_md5_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    return _metrics(truth, found)


def new_recall(docs):
    """Shared-shingle shape (the committed query body)."""
    sht = minhash.shingle_table(docs).persist()
    truth = ngram.jaccard_pairs_from_shingles(sht, threshold=0.5, max_df=50).select(
        "doc_a", "doc_b"
    )
    found = minhash.minhash_md5_pairs_from_shingles(sht, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    return _metrics(truth, found)


def main():
    spark = get_spark(
        app_name="ab-lshrecall-r17",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    docs = table(spark, SF_DIR, "documents")
    docs.collect()

    # rows-identical check first (cheap at any SF): the two shapes must
    # produce the same 1-row metric.
    spark.catalog.clearCache()
    a = old_recall(docs).collect()
    spark.catalog.clearCache()
    b = new_recall(docs).collect()
    assert a == b, f"metric mismatch: {a} vs {b}"
    print("metric identical:", a)

    variants = {
        "old": lambda: old_recall(docs),
        "new": lambda: new_recall(docs),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, build in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab lsh_recall {name} r{r}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    for name, ts in results.items():
        ts_s = sorted(ts)
        med = ts_s[len(ts_s) // 2]
        print(
            f"{name:4} min {min(ts):6.3f}  med {med:6.3f}  all "
            + " ".join(f"{t:.2f}" for t in ts)
        )
    spark.stop()


if __name__ == "__main__":
    main()
