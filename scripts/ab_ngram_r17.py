"""Interleaved same-session A/B: old (rare self-join) vs new (pruned
posting-list collect + map-side pair explode) candidate pipeline for
the ngram pair finders. Same drift-cancelling protocol as
ab_minhash_r17.py.

Usage: python scripts/ab_ngram_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import spread, table
from chronobase_spark.dedup import ngram
from chronobase_spark.dedup.ngram import shingles

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def old_pair_candidates(df, text_col, id_col, n, max_df, do_spread):
    src = spread(df, key=id_col) if do_spread else df
    sh = src.select(
        F.col(id_col).alias("doc"), F.explode(shingles(F.col(text_col), n)).alias("sh")
    ).persist()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    rare = sh.join(
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .hint("shuffle_hash"),
        "sh",
    ).select("doc", "sh")
    a, b = rare.alias("a"), rare.hint("shuffle_hash").alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(
        F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a")
    ).hint("shuffle_hash")
    sb = sizes.select(
        F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b")
    ).hint("shuffle_hash")
    return common.join(sa, "doc_a").join(sb, "doc_b")


def old_jaccard(df, do_spread):
    cand = old_pair_candidates(df, "text", "doc_id", 3, 50, do_spread)
    jac = F.round(
        F.col("common").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double"),
        6,
    )
    return cand.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.5
    )


def main():
    spark = get_spark(app_name="ab-ngram-r17", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    docs = table(spark, SF_DIR, "documents")
    docs.collect()

    variants = {
        "jac/old": lambda: old_jaccard(docs, do_spread=False),
        "jac/old+spread": lambda: old_jaccard(docs, do_spread=True),
        "jac/new-nospread": lambda: ngram.jaccard_pairs(docs, threshold=0.5, max_df=50),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
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
        print(f"{name:15} min {min(ts):6.3f}  med {med:6.3f}  all "
              + " ".join(f"{t:.2f}" for t in ts))
    spark.stop()


if __name__ == "__main__":
    main()
