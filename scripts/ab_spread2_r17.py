"""Interleaved A/B round 2 for catalog.spread: the remaining heavy
map stages — BPE encoded word freqs (regex explode), span hashes (md5
per 8-token window), DSIR hashed-bigram buckets (md5 per bigram), and
the LM per-doc bigram TF (for completeness; round 1's lm_tri_counts
probe was marginal).

Usage: python scripts/ab_spread2_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import spread, table
from chronobase_spark.functions import bpe
from chronobase_spark.functions import text as T

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    spark = get_spark(
        app_name="ab-spread2-r17",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    docs = table(spark, SF_DIR, "documents")
    docs.collect()
    spark.range(1024).repartition(CPUS).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def bpe_words(src):
        return bpe.encoded_word_freqs(src)

    def spans(src):
        sp = T.span_hashes("toks", 8)
        return (
            src.select("doc_id", T.tokens(F.col("text")).alias("toks"))
            .select("doc_id", F.explode(sp).alias("span_hash"))
            .groupBy("span_hash")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_occurrences"),
            )
            .filter(F.col("n_docs") >= 2)
        )

    def dsir_buckets(src):
        return T._dsir_doc_buckets(src, "en", "doc_id", "text")

    def bigram_tf(src):
        return T._doc_bigram_tf(src, "doc_id", "text")

    fams = {
        "bpe_words": bpe_words,
        "spans": spans,
        "dsir_buckets": dsir_buckets,
        "bigram_tf": bigram_tf,
    }
    variants = {}
    for fname, fn in fams.items():
        variants[f"{fname}/plain"] = lambda f=fn: f(docs)
        variants[f"{fname}/spread"] = lambda f=fn: f(spread(docs, key="doc_id"))
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
            f"{name:22} min {min(ts):6.3f}  med {ts_s[len(ts_s)//2]:6.3f}  all "
            + " ".join(f"{t:.2f}" for t in ts)
        )
    spark.stop()


if __name__ == "__main__":
    main()
