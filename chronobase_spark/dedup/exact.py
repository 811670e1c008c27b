"""Exact and normalized exact deduplication.

The canonical first pass of any training-data pipeline: group on the
(normalized) content, keep one representative. One hash shuffle on the
content key; at 100 TB, group on a digest (xxhash64/sha2 of the text)
instead of the raw text so the shuffle carries 8-32 bytes per row, not
the document body.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize(text: Column) -> Column:
    """Canonical form for near-exact matching: lowercase, strip
    punctuation, collapse whitespace."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the minimum-id representative per exact text; report group
    size. Returns (doc_id, dup_count) — dup_count > 1 marks duplicate
    clusters."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    ).select(id_col, "dup_count")


def dedup_normalized(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the normalized form (case/punct/whitespace
    -insensitive)."""
    return (
        df.select(F.col(id_col), normalize(F.col(text_col)).alias("_norm"))
        .groupBy("_norm")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .select(id_col, "dup_count")
    )


def canonical_map(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate-cluster canonical assignment: every row keeps its id
    plus the minimum id sharing its normalized text — the keep-one
    mapping a training pipeline joins back onto the corpus to drop (or
    downweight) duplicates without losing row identity. One window min
    over the normalized key (a single hash shuffle); at 100 TB, window
    over a digest of the text (see dedup_by_digest) so the shuffle
    carries hashes, not bodies."""
    w = Window.partitionBy(normalize(F.col(text_col)))
    canonical = F.min(id_col).over(w).alias("canonical_id")
    return df.select(
        F.col(id_col),
        canonical,
    ).withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))


def dedup_by_digest(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scale variant: shuffle a 64-bit digest of the normalized text
    instead of the text itself (the shuffle payload at 100 TB is ids +
    hashes only). Collisions at 64 bits are ~n²/2⁶⁵ — negligible below
    ~10⁹ docs; use sha2-256 beyond."""
    h = F.xxhash64(normalize(F.col(text_col)))
    return (
        df.select(F.col(id_col), h.alias("_digest"))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .select(id_col, "dup_count")
    )
