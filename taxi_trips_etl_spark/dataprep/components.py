"""Connected components over a pair graph (min-label propagation).

The canonicalization complement to pairwise near-dup detection: pairs
(a,b) form an undirected graph; every doc in a component should map to
ONE canonical id (the component minimum), not just to its pair partner
— keep-first pair dropping over-deletes on duplicate cliques and
chains.

Algorithm: iterative min-label propagation. Each round every node takes
the min of its own label and its neighbors' labels; converged when no
label changes. Rounds = O(component diameter) — near-dup components
are shallow (dup clusters, not paths), so this converges in a handful
of rounds; star-contraction variants cut worst-case depth if ever
needed.

Scale mechanics: per round, one join of the (symmetrized) edge list to
the label table + one min-aggregate — both keyed shuffles. The label
table is ``localCheckpoint``-ed each round: iterative lineage otherwise
grows exponentially and re-executes every prior round (classic Spark
iterative-algorithm trap). Driver sees only the changed-row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """→ (doc_id, component_id): component_id = min doc_id reachable.

    Only nodes that appear in ``pairs`` are returned; singletons are
    their own components trivially (left-join this output and coalesce
    to doc_id for a full mapping).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # carry old_label through the checkpoint so convergence is a
        # filter over the already-materialized blocks — not a second
        # old-vs-new shuffle join per round
        cand = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = cand.filter(F.col("label") != F.col("old_label")).count()
        labels = cand.select("node", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


def canonicalize_near_dups(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Component-aware dedup: keep exactly one doc (the component min)
    per near-dup component; untouched docs pass through."""
    comp = connected_components(pairs)
    keep_from_components = comp.filter(
        F.col("doc_id") == F.col("component_id")
    ).select("doc_id")
    in_graph = comp.select("doc_id")
    untouched = docs.select("doc_id").join(in_graph, "doc_id", "left_anti")
    keepers = untouched.unionByName(keep_from_components)
    return docs.join(keepers, "doc_id")
