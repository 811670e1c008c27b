"""Interleaved same-session A/B: old embedding_dim_cov_topk Σxy shape
(vec_id-keyed self-join of the exploded (vec, pos, x) table — corpus×64
rows shuffled on BOTH sides) vs new (map-side nested posexplode pair
generation — zero corpus-sized exchange). Alternating executions cancel
session drift (the r17 methodology).

Usage: python scripts/ab_dimcov_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark import queries as q
from chronobase_spark.catalog import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

TOPK = 20


def old_dimcov(emb):
    """Pre-change shape, verbatim: exploded table self-joined on vec_id."""
    emb = emb.filter(F.col("embedding").isNotNull())
    ex = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "vec_id",
        "pos",
        F.round(F.col("v").cast("double") * F.lit(1000000.0), 0)
        .cast("bigint")
        .alias("x"),
    )
    as_dec = lambda c: c.cast("decimal(28,0)")  # noqa: E731
    dimstats = ex.groupBy("pos").agg(
        F.sum(as_dec(F.col("x"))).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a = ex.alias("a")
    b = ex.hint("shuffle_hash").alias("b")
    xy = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .groupBy(F.col("a.pos").alias("pos_a"), F.col("b.pos").alias("pos_b"))
        .agg(F.sum(as_dec(F.col("a.x")) * as_dec(F.col("b.x"))).alias("sxy"))
    )
    da = dimstats.select(
        F.col("pos").alias("pos_a"), F.col("s").alias("sa"), F.col("n").alias("n_vecs")
    )
    db = dimstats.select(F.col("pos").alias("pos_b"), F.col("s").alias("sb"))
    cov = (
        xy.join(da, "pos_a")
        .join(db, "pos_b")
        .select(
            "pos_a",
            "pos_b",
            "n_vecs",
            (as_dec(F.col("n_vecs")) * F.col("sxy") - F.col("sa") * F.col("sb")).alias(
                "cov_i"
            ),
        )
    )
    return (
        cov.orderBy(F.abs(F.col("cov_i")).desc(), "pos_a", "pos_b")
        .limit(TOPK)
        .select(
            "pos_a",
            "pos_b",
            "n_vecs",
            F.col("cov_i").cast("string").cast("double").alias("cov_scaled"),
        )
    )


def main():
    spark = get_spark(
        app_name="ab-dimcov-r17", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    emb = table(spark, SF_DIR, "embeddings")
    emb.collect()

    # rows-identical check: old shape vs committed (new) query body.
    a = old_dimcov(emb).collect()
    b = q.queries()["embedding_dim_cov_topk"](spark, SF_DIR).collect()
    assert a == b, f"result mismatch:\n{a}\nvs\n{b}"
    print(f"results identical ({len(a)} rows)")

    variants = {
        "old": lambda: old_dimcov(emb),
        "new": lambda: q.queries()["embedding_dim_cov_topk"](spark, SF_DIR),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, build in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab dimcov {name} r{r}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        if not ts:
            continue
        ts_s = sorted(ts)
        med = ts_s[len(ts_s) // 2]
        print(
            f"{name:4} min {min(ts):6.3f}  med {med:6.3f}  all "
            + " ".join(f"{t:.2f}" for t in ts)
        )
    spark.stop()


if __name__ == "__main__":
    main()
