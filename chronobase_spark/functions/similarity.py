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


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Per-label elementwise mean vector — the k-means/IVF "update" step
    (each label's centroid), fully distributed: posexplode is map-side,
    the (label, pos) aggregate partial-aggregates before its one
    shuffle (|labels|·dim groups — tiny), and the array rebuild groups
    ``dim`` rows per label.

    Determinism for cross-engine oracles: each float32 component is cast
    to float64, rounded, then summed as DECIMAL — an order-insensitive
    exact sum, so the centroid is identical under any partitioning and
    in any engine performing the same arithmetic. Returns
    (label, cvec: array<double>).
    """
    ex = df.select(
        F.col(label_col).alias("clabel"),
        F.posexplode(vec_col).alias("pos", "v"),
    )
    per_pos = ex.groupBy("clabel", "pos").agg(
        F.round(
            (
                F.sum(
                    F.round(F.col("v").cast("double"), round_digits).cast(
                        "decimal(28,6)"
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ),
            round_digits,
        ).alias("avg_v")
    )
    return per_pos.groupBy("clabel").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "avg_v"))),
            lambda s: s["avg_v"],
        ).alias("cvec")
    )


def squared_distance(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance in float64 (mirrors the
    oracle's list_sum(list_transform(...)) fold exactly)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_nearest_centroid(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """k-means/IVF "assign" step: each vector's nearest centroid by
    squared L2. Centroids broadcast (|labels| rows); the corpus streams
    through once; the argmin is a single-shuffle min(struct) aggregate
    with map-side partial aggregation — no window, no second pass.
    Distance is rounded before the argmin so the winner is deterministic
    across engines; ties break by centroid label. Returns every input
    column of ``df`` minus the vector, plus (assigned, dist).
    """
    dist = F.round(
        squared_distance(F.col(vec_col), F.col("cvec")), round_digits
    )
    pairs = df.crossJoin(F.broadcast(centroids)).select(
        *[c for c in df.columns if c != vec_col],
        F.col("clabel"),
        dist.alias("dist"),
    )
    keys = [c for c in df.columns if c != vec_col]
    return (
        pairs.groupBy(*keys)
        .agg(F.min(F.struct("dist", "clabel")).alias("_m"))
        .select(
            *keys,
            F.col("_m.clabel").alias("assigned"),
            F.col("_m.dist").alias("dist"),
        )
    )


def int8_quant_stats(vec: Column, round_digits: int = 6) -> Column:
    """Symmetric int8 quantization of one embedding vector, summarized
    as struct(qscale, q_sum, q_min, q_max, n_sat).

    The 4× compression step every large ANN index applies before
    storage: per-vector scale = max|v| / 127, code = clamp(round(v /
    scale)) ∈ [-127, 127]. The summary exposes the scale plus exact
    integer facts about the code vector (sum, extrema, saturation
    count) — integers compare exactly cross-engine, so the whole
    operator is oracle-checkable without shipping arrays through the
    comparator.

    Expression discipline: ``scale`` and the code array are each bound
    once via single-element ``transform`` lets — referencing the Python
    column object N times would re-evaluate the max-abs fold / the
    quantize transform N times per row (the HOF re-evaluation trap, see
    functions/text.with_tokens). Rounding is floor(x + 0.5) — half
    toward +inf — because engines disagree on round()'s half-away vs
    banker's behavior but agree exactly on floor.
    """
    maxabs = F.aggregate(
        vec, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v.cast("double")))
    )

    def with_codes(q: Column) -> Column:
        return F.struct(
            F.aggregate(q, F.lit(0).cast("long"), lambda a, v: a + v).alias(
                "q_sum"
            ),
            F.array_min(q).alias("q_min"),
            F.array_max(q).alias("q_max"),
            F.size(F.filter(q, lambda v: F.abs(v) == 127)).alias("n_sat"),
        )

    def with_scale(s: Column) -> Column:
        codes = F.transform(
            vec,
            lambda v: F.when(s == F.lit(0.0), F.lit(0).cast("long")).otherwise(
                F.least(
                    F.lit(127).cast("long"),
                    F.greatest(
                        F.lit(-127).cast("long"),
                        F.floor(v.cast("double") / s + F.lit(0.5)),
                    ),
                )
            ),
        )
        inner = F.get(F.transform(F.array(codes), with_codes), 0)
        return F.struct(
            F.round(s, round_digits).alias("qscale"),
            inner["q_sum"].alias("q_sum"),
            inner["q_min"].alias("q_min"),
            inner["q_max"].alias("q_max"),
            inner["n_sat"].alias("n_sat"),
        )

    return F.get(F.transform(F.array(maxabs / F.lit(127.0)), with_scale), 0)


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
