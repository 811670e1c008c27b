"""A/B the mad_outliers_approx plan variants at sf0.1 (r11 verdict #2).

Variant A: current shipped plan (no persist; 3 FileScans of events, the
med_micro sketch computed twice — PLANS.md r11 dump).
Variant B: persist the micro-quantized (event_type, x) projection `v`.
Variant C: persist `dev` (covers v AND the first median sketch).

min-of-3 wall per variant, run with nothing else on the box.
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from chronobase_spark import catalog  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def build(spark, sf_dir, variant):
    ev = catalog.table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.select(
        "event_type",
        F.round(F.col("value") * F.lit(1000000.0), 0).cast("bigint").alias("x"),
    )
    if variant == "B":
        v = v.persist()
    med = v.groupBy("event_type").agg(
        F.percentile_approx(F.col("x"), F.lit(0.5), F.lit(10000)).alias("med_micro")
    )
    dev = v.join(med, "event_type").select(
        "event_type",
        "med_micro",
        F.abs(F.col("x") - F.col("med_micro")).alias("adev"),
    )
    if variant == "C":
        dev = dev.persist()
    mad = dev.groupBy("event_type").agg(
        F.percentile_approx(F.col("adev"), F.lit(0.5), F.lit(10000)).alias("mad_micro")
    )
    out = (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("med_micro").cast("bigint").alias("med_micro"),
            F.min("mad_micro").cast("bigint").alias("mad_micro"),
            F.sum(
                F.when(F.col("adev") > F.lit(3) * F.col("mad_micro"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )
    return v, dev, out


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_mad_approx")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    rows_by_variant = {}
    for variant in ("A", "B", "C"):
        times = []
        for rep in range(3):
            v, dev, out = build(spark, SF_DIR, variant)
            t0 = time.monotonic()
            rows = out.collect()
            times.append(time.monotonic() - t0)
            for df in (v, dev):
                try:
                    df.unpersist()
                except Exception:
                    pass
            rows_by_variant[variant] = sorted(
                (r["event_type"], r["n"]) for r in rows
            )
        results[variant] = min(times)
        print(f"variant {variant}: reps={['%.3f' % t for t in times]} "
              f"min={min(times):.3f}s", flush=True)
    # sanity: (event_type, n) identical across variants (sketch values may
    # legitimately differ between runs only via partition order; n must not)
    assert rows_by_variant["A"] == rows_by_variant["B"] == rows_by_variant["C"], (
        rows_by_variant
    )
    print("RESULT", results)
    spark.stop()


if __name__ == "__main__":
    main()
