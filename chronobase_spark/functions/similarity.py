"""Vector similarity over ``array<float>`` embedding columns.

Everything here is native higher-order-function column math
(``zip_with`` / ``aggregate``) — JVM-side, codegen-friendly, no UDF.
Accumulation is float64 over float32 inputs, strictly sequential, so
results are bit-reproducible and match an ANSI-SQL oracle computing the
same fold.

Scale posture: brute-force top-k is O(n·q) dot products — fine when the
query side is small/broadcast; beyond that use the LSH-bucketed path in
``chronobase_spark.dedup.embedding`` (candidate generation via
random-hyperplane signatures, exact re-rank inside buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in float64 (exact same fold as the
    DuckDB oracle's list_sum(list_transform(...)))."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm, float64 fold."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe only insofar as inputs are non-empty."""
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it is small by construction — a handful
    of probe vectors), so the corpus streams through executors exactly
    once with no shuffle; per-query ranking then shuffles only
    (q, corpus_id, sim) triples, and TakeOrdered keeps k per query.

    Similarity is rounded before ranking so rank boundaries are
    deterministic across engines; residual ties break by corpus id.
    Returns (q_id, n_id, sim).
    """
    q = queries.select(
        F.col(query_id).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(corpus_id).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col("n_id"))
    sim = F.round(cosine(F.col("q_vec"), F.col("n_vec")), round_digits)
    scored = pairs.select("q_id", "n_id", sim.alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )
