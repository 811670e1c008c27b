"""Batch writers — the engine's canonical table layout.

The write conventions ARE the optimizer story at 100 TB (SURVEY.md §4):
(1) partition by a time bucket → partition pruning for time-range scans
    (the reference's tablet [MinTS,MaxTS] skip, table.go:146-149);
(2) sort within partitions by (ts, key) → tight parquet row-group
    min/max stats (the reference's tablet sort, tablet.go:124-132);
(3) zstd columnar compression (vs. the reference's per-block gzip
    BestSpeed, compression.go:78).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_id",
    bucket: str = "day",
    mode: str = "append",
) -> None:
    """Write a time-series table in the engine's canonical layout.

    Sort tie-break: ``key_col`` when the schema has it, else ``key``
    (the reference's Row.Key, row.go:6-10), else timestamp alone — the
    facade accepts arbitrary row schemas, not just the test corpus.
    """
    if key_col not in df.columns:
        key_col = "key" if "key" in df.columns else None
    sort_cols = [ts_col] + ([key_col] if key_col else [])
    bucket_col = F.to_date(ts_col) if bucket == "day" else F.date_trunc(bucket, ts_col)
    (
        df.withColumn("_bucket", bucket_col)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .partitionBy("_bucket")
        .parquet(path)
    )


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Plain dimension/fact table write (no time axis)."""
    df.write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str | list[str],
    n_buckets: int = 8,
    sort_col: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table: pre-shuffled on ``bucket_col`` at write
    time so joins/aggregations on that key read co-located buckets and
    skip the runtime Exchange entirely — the 100 TB answer for a fact
    table joined on the same key every day (pay the shuffle once, at
    ingest). Bucket counts must match across co-joined tables, and the
    bucket columns must EQUAL the join's equi-keys (Spark v1 bucketing
    ignores a subset layout — measured in dedup.minhash's bucketed
    admission model). A stale managed location from a previous session
    (the default in-memory catalog forgets tables; their files
    persist) is cleared first so overwrite never dies with
    LOCATION_ALREADY_EXISTS."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    p = spark._jvm.org.apache.hadoop.fs.Path(f"{wh}/{table_name}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        fs.delete(p, True)
    writer = df.write.mode(mode).bucketBy(n_buckets, cols[0], *cols[1:])
    if sort_col is not None:
        s = [sort_col] if isinstance(sort_col, str) else list(sort_col)
        writer = writer.sortBy(s[0], *s[1:])
    writer.saveAsTable(table_name)


def overwrite_time_partitions(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_id",
    bucket: str = "day",
) -> None:
    """Idempotent backfill: dynamic partition overwrite replaces ONLY
    the time buckets present in ``df``, leaving every other partition
    untouched — re-running a day's pipeline is safe at any scale, and
    no job ever rewrites the whole table. (Static overwrite mode — the
    Spark default — would truncate the table first; always scope
    overwrites to the partitions in hand.)"""
    bucket_col = F.to_date(ts_col) if bucket == "day" else F.date_trunc(bucket, ts_col)
    (
        df.withColumn("_bucket", bucket_col)
        .sortWithinPartitions(ts_col, key_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(path)
    )
