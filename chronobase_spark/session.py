"""SparkSession factory for the engine.

The reference configures its engine via JSON (reference
internal/config/config.go) — block size, compression, flush intervals,
concurrency knobs. In a Spark-native design those map onto session-level
configuration; everything here is chosen for the 100 TB posture:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  replaces the reference's static, unenforced concurrency knobs
  (config.go:26-30).
* zstd Parquet compression replaces per-block gzip BestSpeed
  (reference internal/storage/compression.go:78) — columnar + zstd
  dominates row-block gzip on both ratio and scan speed.
* Arrow execution for the few Pandas-UDF extension operators.
* shuffle partitions default to the local core count; on a real cluster
  AQE coalescing makes the initial number far less sensitive.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "chronobase-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same
    configuration is cluster-safe (nothing here pins to local mode).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Local mode puts scheduler + all executor threads in one JVM;
        # the 1g default heap stalls shuffles at 32 threads. Honored
        # only if this process launches the JVM (a caller-owned session
        # keeps its own setting).
        .config("spark.driver.memory", driver_mem)
        # Adaptive execution: runtime shuffle-partition coalescing,
        # skew-join splitting, dynamic join-strategy switching.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Runtime-injected bloom filters: a selective dimension filter
        # seeds a bloom filter pushed into the fact-side scan — at
        # 100 TB this prunes shuffle input for star joins that are too
        # big to broadcast (complements AQE's strategy switching).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Columnar + Arrow for the Pandas-UDF extension path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (off by default in 4.1):
        # lets the chronotab migration source receive ts_ns bounds and
        # prune tablet blocks at planning time (sources/tabfile.py).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Write posture (reference gzip blocks -> Parquet zstd).
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Session timezone pinned so timestamp literals are unambiguous
        # and match the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # The events table stores parquet TIMESTAMP(NANOS), which Spark 4
        # rejects by default; read the raw int64 and convert to µs in the
        # catalog (`timestamp_micros(ts div 1000)`) — the identical
        # truncation DuckDB applies, so both engines see the same values.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
