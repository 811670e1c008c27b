"""Interleaved A/B for the r17 top-token rewrite: the old
explode → (doc, tok) count → (doc) max/sum → join chain vs the
map-only text.top_token_stats fold, with and without catalog.spread
on the scan (the fold is heavy per-row work — on an unsplittable
local scan it serializes without the spread).

Usage: python scripts/ab_toptok_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import spread, table
from chronobase_spark.functions import text

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def old_chain(docs):
    tok = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok")
    )
    top = (
        tok.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_tok"))
    )
    grams = docs.select(
        "doc_id", F.inline(F.array(text.bigram_dup_stats(F.col("text"))))
    )
    return grams.join(top, "doc_id", "left").select(
        "doc_id", "n_grams", "top_c", "n_tok"
    )


def new_chain(docs):
    return docs.select(
        "doc_id",
        text.bigram_dup_stats(F.col("text")).alias("_bds"),
        text.top_token_stats(F.col("text")).alias("_tts"),
    ).select(
        "doc_id",
        F.col("_bds.n_grams").alias("n_grams"),
        F.col("_tts.top_c").alias("top_c"),
        F.col("_tts.n_tok").alias("n_tok"),
    )


def main():
    spark = get_spark(
        app_name="ab-toptok-r17",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    docs = table(spark, SF_DIR, "documents")
    docs.collect()

    variants = {
        "old_chain": lambda: old_chain(docs),
        "new_maponly": lambda: new_chain(docs),
        "new_spread": lambda: new_chain(spread(docs, key="doc_id")),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    for name, build in variants.items():  # codegen warmup
        spark.catalog.clearCache()
        build().write.format("noop").mode("overwrite").save()
    for r in range(ROUNDS):
        for name, build in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab {name} r{r}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        ts_s = sorted(ts)
        print(
            f"{name:14} min {min(ts):6.3f}  med {ts_s[len(ts_s)//2]:6.3f}  all "
            + " ".join(f"{t:.2f}" for t in ts)
        )
    spark.stop()


if __name__ == "__main__":
    main()
