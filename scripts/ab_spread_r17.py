"""Interleaved A/B: per-family map-stage cost with vs without a spread
(conditional repartition) of the unsplittable documents scan — decides
where catalog.spread pays its exchange (rule of thumb from the jaccard
A/B: only when the downstream per-row work is ≳1 s single-core).

Usage: python scripts/ab_spread_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import spread, table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    spark = get_spark(app_name="ab-spread-r17", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    docs = table(spark, SF_DIR, "documents")
    docs.collect()
    # Python-worker warmup (the bench convention)
    spark.range(1024).repartition(CPUS).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    from chronobase_spark.dedup import cdc, simhash, winnow
    from chronobase_spark.functions import multimodal
    from chronobase_spark.functions import text as T

    def simhash_md5_sigs(src):
        return simhash.simhash_md5_chunks(src)

    def winnow_fps(src):
        return winnow.winnow_fingerprints(src)

    def cdc_chunks(src):
        return cdc.chunk_table(src)

    def lm_tri_counts(src):
        return (
            src.select(F.explode(T.lm_trigrams(F.col("text"))).alias("g"))
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def entropy(src):
        return src.select("doc_id", T.char_entropy(F.col("text")).alias("e"))

    def wav(src):
        return multimodal.decode_wav(multimodal.to_wav_payload(src))

    def ppm(src):
        return multimodal.decode_ppm(multimodal.to_ppm_payload(src))

    fams = {
        "simhash_md5_sigs": simhash_md5_sigs,
        "winnow_fps": winnow_fps,
        "cdc_chunks": cdc_chunks,
        "lm_tri_counts": lm_tri_counts,
        "char_entropy": entropy,
        "wav_decode": wav,
        "ppm_decode": ppm,
    }
    variants = {}
    for fname, fn in fams.items():
        variants[f"{fname}/plain"] = (lambda f=fn: f(docs))
        variants[f"{fname}/spread"] = (
            lambda f=fn: f(spread(docs, key="doc_id"))
        )
    results: dict[str, list[float]] = {k: [] for k in variants}
    for name, build in variants.items():  # warmup (codegen)
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
        print(f"{name:28} min {min(ts):6.3f}  med {med:6.3f}  all "
              + " ".join(f"{t:.2f}" for t in ts))
    spark.stop()


if __name__ == "__main__":
    main()
