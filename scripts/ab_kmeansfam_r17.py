"""Interleaved same-session A/B over the kmeans-consumer family:

- cluster_balanced_sample: old (kmeans assignment subtree compiled
  TWICE — once under the cell-count aggregate, once under the keep
  test — and the k-row count joined back unhinted, which planned as
  SortMergeJoin) vs new (assignment persisted once + explicit
  broadcast of the constant-k count table).
- ivf_kmeans_topk: old (the (vec, nrm, cell) `cells` table compiled
  twice — probe filter + candidate join) vs new (cells persisted).

Usage: python scripts/ab_kmeansfam_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark.catalog import table
from chronobase_spark.functions import similarity
from chronobase_spark.functions.similarity import cosine_pre, kmeans_lloyd, norm

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

K = 8
QUOTA = 40
PROBES = [0, 1, 2]


def cbs(emb, cache: bool, bcast: bool):
    assigned = kmeans_lloyd(emb, k=K, iters=2).select("vec_id", "assigned")
    if cache:
        assigned = assigned.persist()
    cnt = assigned.groupBy("assigned").agg(F.count(F.lit(1)).alias("c"))
    if bcast:
        cnt = F.broadcast(cnt)
    bucket = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    sel = assigned.join(cnt, "assigned").select(
        "assigned", "vec_id", "c", bucket.alias("bucket")
    )
    keep = F.col("bucket") * F.col("c") < F.lit(QUOTA * 65536)
    return sel.groupBy("assigned").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.count(F.when(keep, F.lit(1))).cast("bigint").alias("n_kept"),
        F.sum(F.when(keep, F.col("vec_id")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("kept_id_sum"),
    )


def ivf(emb, cache: bool, k: int = 10, round_digits: int = 6):
    base = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("_nrm")
    )
    cells = base.join(
        kmeans_lloyd(emb, k=K, iters=2).select("vec_id", "assigned").hint(
            "shuffle_hash"
        ),
        "vec_id",
    )
    if cache:
        cells = cells.persist()
    probes = cells.filter(F.col("vec_id").isin(PROBES)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("_nrm").alias("q_nrm"),
        F.col("assigned").alias("q_cell"),
    )
    cand = cells.join(
        F.broadcast(probes),
        (F.col("assigned") == F.col("q_cell")) & (F.col("vec_id") != F.col("q_id")),
    )
    sim = F.round(
        cosine_pre(F.col("embedding"), F.col("q_vec"), F.col("_nrm"), F.col("q_nrm")),
        round_digits,
    )
    scored = cand.select("q_id", F.col("vec_id").alias("n_id"), sim.alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def main():
    spark = get_spark(
        app_name="ab-kmeansfam-r17", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    emb = table(spark, SF_DIR, "embeddings")
    emb.collect()

    # equality pins (sorted rows)
    for old, new, label in (
        (cbs(emb, False, False), cbs(emb, True, True), "cbs"),
        (ivf(emb, False), ivf(emb, True), "ivf"),
    ):
        spark.catalog.clearCache()
        a = sorted(map(tuple, old.collect()))
        spark.catalog.clearCache()
        b = sorted(map(tuple, new.collect()))
        assert a == b, f"{label} mismatch"
        print(f"{label}: results identical ({len(a)} rows)")

    variants = {
        "cbs/old": lambda: cbs(emb, False, False),
        "cbs/new": lambda: cbs(emb, True, True),
        "ivf/old": lambda: ivf(emb, False),
        "ivf/new": lambda: ivf(emb, True),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, build in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab {name} r{r}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        if not ts:
            continue
        ts_s = sorted(ts)
        med = ts_s[len(ts_s) // 2]
        print(
            f"{name:8} min {min(ts):6.3f}  med {med:6.3f}  all "
            + " ".join(f"{t:.2f}" for t in ts)
        )
    spark.stop()


if __name__ == "__main__":
    main()
