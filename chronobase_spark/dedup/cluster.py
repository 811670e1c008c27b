"""Connected-components clustering of near-duplicate pairs.

Near-dup detection emits PAIRS; a pipeline needs CLUSTERS (keep one doc
per transitive group: a~b and b~c must collapse a, b, c together even
when a~c was never emitted). This is the standard second stage after
MinHash/Jaccard pair generation.

Algorithm: iterative min-label propagation (the Pregel/GraphX "small
component id wins" scheme) — every node starts labeled with its own id;
each round, a node takes the minimum label among itself and its
neighbors; converged when no label changes. Rounds needed = graph
diameter, and near-dup graphs are unions of small dense cliques, so
convergence is fast (2-3 rounds in practice).

Scale: each round is one join (edges ⋈ labels, both hash-partitioned
on node id) + one min-aggregate — all distributed, no driver-side graph.
Labels and the symmetrized edge list are persisted; only the per-round
changed-count crosses to the driver. This is the same shape GraphX's
connectedComponents runs; implemented directly on DataFrames to stay in
Catalyst/Tungsten.

The reference has no multi-row operator at all (SURVEY §2.1), let alone
an iterative one; this extends its dedup-adjacent surface (primary-keys
intent, pkg/db/types.go:10-13) to transitive duplicate groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, label) for every node appearing in ``edges``; ``label`` is
    the minimum node id reachable from ``id`` (= the cluster's canonical
    id). Raises if not converged within ``max_iter`` rounds (diameter
    bound; near-dup graphs converge in a handful)."""
    # Pre-partition the (static) symmetric edge list on the join key and
    # persist: every round's edges ⋈ labels then re-shuffles ONLY the
    # labels side — the edge shuffle (the big one: |edges| ≫ |nodes|) is
    # paid once, not once per round.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    prev_cache = labels  # the persisted frame backing `labels`
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["id"])
            .groupBy(F.col("b").alias("nid"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # One persisted frame per round carries BOTH the new label and
        # the changed flag: the convergence-count action below
        # materializes it, so next round's lineage bottoms out HERE —
        # not back through the (about to be unpersisted) old labels.
        # Counting on an unpersisted sibling plan instead would leave
        # the new labels uncached and each round would recompute every
        # prior round (O(rounds²) work, unbounded lineage).
        # least() skips nulls, so isolated-this-round nodes keep their label.
        tagged = (
            labels.join(nbr_min, labels["id"] == nbr_min["nid"], "left")
            .select(
                "id",
                F.least("label", "nbr_label").alias("label"),
                # labels only ever decrease → strict inequality = change
                (F.col("nbr_label") < F.col("label"))
                .cast("int")
                .alias("_chg"),
            )
            .persist()
        )
        changed = tagged.agg(F.sum("_chg")).collect()[0][0] or 0
        prev_cache.unpersist()
        prev_cache = tagged
        labels = tagged.select("id", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    sym.unpersist()
    return labels


def assign_clusters(
    all_ids: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Every id in ``all_ids`` mapped to its duplicate-cluster canonical
    id (its own id when it is in no pair) — the join-back table the
    pipeline filters on (keep rows where doc_id == cluster_id)."""
    labels = connected_components(edges, src, dst)
    return (
        all_ids.select(id_col)
        .join(labels, all_ids[id_col] == labels["id"], "left")
        .select(
            id_col,
            F.coalesce("label", F.col(id_col)).alias("cluster_id"),
        )
    )
