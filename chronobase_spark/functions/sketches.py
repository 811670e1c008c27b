"""Portable count-min sketch (Cormode & Muthukrishnan 2005) as plain
DataFrames — approximate point-frequency estimation whose entire state
is ``depth × width`` counter rows, independent of corpus size.

Why a hand-rolled CMS next to Spark's built-in sketches: the built-in
``count_min_sketch`` aggregate emits an opaque binary (engine-internal
hashing — unoracleable, like the HLL bytes in sketch_rollup_users);
this one hashes with md5, which every engine computes identically, so
sketch counters AND estimates are fully checkable against the SQL
oracle — the same portability trick as packing.md5_split.

Scale story: the counter build is ONE partial-agged groupBy whose
output is ≤ depth·width rows no matter the input (the classic
mergeable-summary contract — per-partition sketches union by adding
counters, which is exactly what map-side partial aggregation does
here). Estimation joins a handful of probes against the tiny counter
table — broadcast, never a corpus scan. At 100 TB this answers "how
often does key X occur" in kilobytes of state where an exact groupBy
would shuffle billions of distinct keys.

Estimate guarantee: est ≥ true count always (counters only ever
over-count via collisions); est ≤ true + εN with probability 1−δ for
width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉ (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, seed: Column, width: int) -> Column:
    """Portable hash bucket: first 8 hex chars of md5("<seed>:<key>")
    as an integer, mod width — bit-identical in any engine with md5
    (the SQL oracle uses ('0x' || substr(md5(...), 1, 8))::BIGINT)."""
    h = F.md5(F.concat(seed.cast("string"), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % F.lit(width)


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the counter table: (seed, bucket, c) with ≤ depth·width
    rows — one map-side-partial groupBy, mergeable by construction.

    NULL keys are EXCLUDED (COUNT(col) semantics): a NULL key hashes
    to a NULL bucket, which would both leak `depth` extra counter rows
    past the documented state bound and make a NULL probe estimate 0
    while NULL rows existed — violating est ≥ true. Point-frequency of
    NULL is not a sketchable question; callers who need it should
    count it exactly."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    hashed = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("k"), seeds)
        .select("seed", _bucket(F.col("k"), F.col("seed"), width).alias("bucket"))
    )
    return hashed.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]``: min over the
    depth counter rows each probe hashes to (left join + 0 so a probe
    hashing to a never-seen bucket estimates 0, not absence). The join
    is |probes|·depth rows against a ≤ depth·width counter table —
    both tiny, broadcastable. NULL probes are dropped — the sketch
    never counted NULL keys (see cms_build), so answering 0 for them
    would be an undercount, and answering anything else a guess."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    pb = (
        probes.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col), seeds)
        .select(
            key_col,
            "seed",
            _bucket(F.col(key_col), F.col("seed"), width).alias("bucket"),
        )
    )
    return (
        pb.join(F.broadcast(counters), ["seed", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )
