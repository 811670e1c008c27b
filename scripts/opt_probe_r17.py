"""r17 optimization probe: isolate component costs of the shared dedup
pipelines (guide §1 — measure first) so optimization effort lands where
the time actually goes.

Each fragment executes into the noop sink (guide §1.4), min-of-N wall
seconds, cache cleared between reps (the bench convention). Job
descriptions label the UI (guide §1.5).

Usage: python scripts/opt_probe_r17.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import table as load_table
from chronobase_spark.dedup import minhash, ngram

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timed(spark, name, build):
    best = float("inf")
    for _ in range(REPS):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"probe: {name}")
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    spark.catalog.clearCache()
    print(f"{best:8.3f}  {name}", flush=True)
    return best


def main():
    spark = get_spark(app_name="opt-probe-r17", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    docs = load_table(spark, SF_DIR, "documents")
    docs.collect()  # warm footers/JVM

    # --- baseline full queries ---
    timed(spark, "minhash_md5_pairs (full)",
          lambda: minhash.minhash_md5_pairs(docs, threshold=0.5))
    timed(spark, "jaccard_pairs (full)",
          lambda: ngram.jaccard_pairs(docs, threshold=0.5, max_df=50))
    timed(spark, "minhash_dedup_pairs (full)",
          lambda: minhash.minhash_dedup_pairs(docs, threshold=0.5))

    # --- components: minhash md5 path ---
    timed(spark, "shingle_table only",
          lambda: minhash.shingle_table(docs))
    timed(spark, "md5_band_table only",
          lambda: minhash.md5_band_table(docs))
    timed(spark, "band self-join (cands only)", lambda: _md5_cands(docs))

    # --- components: jaccard path ---
    timed(spark, "sh explode only (ngram)", lambda: _sh_exploded(docs))
    timed(spark, "_pair_candidates only",
          lambda: ngram._pair_candidates(docs, "text", "doc_id", 3, 50))

    # --- text expression costs over the corpus ---
    from chronobase_spark.functions import text as T
    timed(spark, "tokens() map-only",
          lambda: docs.select(F.size(T.tokens(F.col("text"))).alias("n")))
    timed(spark, "shingles() map-only",
          lambda: docs.select(F.size(ngram.shingles(F.col("text"), 3)).alias("n")))
    timed(spark, "char_entropy map-only",
          lambda: docs.select(T.char_entropy(F.col("text")).alias("e")))
    timed(spark, "md5 16-lane sig (agg only)", lambda: _md5_sig(docs))

    spark.stop()


def _md5_cands(docs):
    banded = minhash.md5_band_table(docs)
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


def _sh_exploded(docs):
    return docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(ngram.shingles(F.col("text"), 3)).alias("sh"),
    )


def _md5_sig(docs):
    exploded = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(ngram.shingles(F.col("text"), 3)).alias("_g"),
    )
    lanes = [
        F.min(minhash.md5_lane(F.col("_g"), i)).alias(f"_m{i}") for i in range(16)
    ]
    return exploded.groupBy("doc").agg(*lanes)


if __name__ == "__main__":
    main()
