"""Interleaved A/B round 3 for catalog.spread: the embedding/ANN
family's heavy per-row vector folds (LSH signature = planes x dim
mults, PQ subspace argmin, probe-cosine scan) over the unsplittable
local embeddings scan.

Usage: python scripts/ab_spread3_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import spread, table
from chronobase_spark.dedup import embedding as emb
from chronobase_spark.functions import similarity as sim

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    spark = get_spark(
        app_name="ab-spread3-r17",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    embt = table(spark, SF_DIR, "embeddings")
    embt.collect()

    fams = {
        "semantic_dedup_scaled": lambda src: emb.semantic_dedup_scaled(src),
        "pq_assign": lambda src: sim.pq_assign(src, m=8),
        "ivf_pq_topk": lambda src: emb.ivf_pq_topk(
            src, probe_id=0, num_planes=6, m=8, k=10
        ),
        "topk_cosine": lambda src: sim.topk_cosine(
            src.filter(F.col("vec_id") == 0), src, k=10
        ),
        "kmeans_lloyd": lambda src: sim.kmeans_lloyd(src),
    }
    variants = {}
    for fname, fn in fams.items():
        variants[f"{fname}/plain"] = lambda f=fn: f(embt)
        variants[f"{fname}/spread"] = lambda f=fn: f(spread(embt, key="vec_id"))
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
            f"{name:28} min {min(ts):6.3f}  med {ts_s[len(ts_s)//2]:6.3f}  all "
            + " ".join(f"{t:.2f}" for t in ts)
        )
    spark.stop()


if __name__ == "__main__":
    main()
