"""MinHash + LSH banding near-duplicate detection — the sub-quadratic
scale path (Broder's MinHash; Leskovec/Rajaraman/Ullman banding scheme).

Pipeline (all native column ops, no UDF):
  1. shingle each doc (word n-grams);
  2. per permutation seed s, minhash_s(doc) = min over shingles of
     xxhash64(shingle, s) — a vector of ``num_perm`` signatures computed
     in ONE pass via transform+aggregate over the shingle array;
  3. split the signature into ``bands`` bands of ``rows_per_band``; docs
     agreeing on any whole band are candidates (group by band value);
  4. verify candidates with exact shingle Jaccard (re-using dedup.ngram
     machinery on the candidate subset only).

Scale: stage 2 is map-only; stage 3 shuffles (band_id, band_hash, doc)
triples — constant bytes/doc; stage 4 touches only candidate pairs.
Nothing is quadratic in corpus size; the P(candidate) S-curve is tuned
by (bands, rows_per_band): with 16 bands × 8 rows, sim 0.8 → ~0.93
candidate probability, sim 0.3 → ~0.001.

The minhash values depend on Spark's xxhash64, so this operator has no
cross-engine SQL oracle (driver records rows-only); correctness is
pinned by tests/test_dedup.py comparing LSH candidates against exact
Jaccard brute force at small scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronobase_spark.dedup.ngram import shingles


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>[num_perm]) — one aggregate pass per doc.

    Permutation family: h_s(x) = xxhash64(x, seed=s); min over the
    doc's shingle set per seed. Docs with no shingles get no signature
    (dropped — they cannot be near-duplicates of anything).
    """
    sh = shingles(F.col(text_col), n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda s: F.array_min(
            F.transform(F.col("_sh"), lambda g: F.xxhash64(g, s))
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc"), sh.alias("_sh"))
        .filter(F.size("_sh") > 0)
        .select("doc", sig.alias("sig"))
    )


def lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 8
) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) agreeing on ≥1 whole band.

    Band hash = the band's slice of the signature array itself (grouping
    on the array value avoids a second hashing step). Self-join happens
    per (band_id, band_value) bucket — bounded fan-out.
    """
    banded = signatures.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.slice("sig", b * rows_per_band + 1, rows_per_band).alias(
                        "band_val"
                    ),
                ),
            )
        ).alias("band"),
    ).select("doc", "band.band_id", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    rows_per_band: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end: LSH candidates verified with exact shingle Jaccard.

    Returns (doc_a, doc_b, jaccard) for verified pairs ≥ threshold.

    The signature table is persisted before banding: the banding stage
    references it 16×(bands) × 2(join sides), and the signature
    expression is ~num_perm × |shingles| hash evaluations per doc —
    recomputing it per reference is a >100× slowdown (measured). At
    100 TB you'd materialize signatures as their own table; persist()
    is the single-job version of that decision. Input is repartitioned
    so signature computation parallelizes across cores/executors.
    """
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sigs = minhash_signature(spread, text_col, id_col, num_perm, n).persist()
    cands = lsh_candidates(sigs, bands, rows_per_band)
    sh = spread.select(
        F.col(id_col).alias("doc"),
        shingles(F.col(text_col), n).alias("_sh"),
    ).filter(F.size("_sh") > 0).persist()
    a = sh.select(F.col("doc").alias("doc_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("_sh").alias("sh_b"))
    verified = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified
