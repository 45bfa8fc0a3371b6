"""Distributed connected components — the clustering step of near-dup
deduplication.

Pair finders (operators/dedup.py: jaccard_pairs, minhash_near_dups,
similarity.embedding near-dups) emit EDGES; an actual dedup pipeline needs
the transitive closure — if A~B and B~C, then {A,B,C} is one duplicate
cluster and one representative survives. This module computes per-node
component labels with pure DataFrame ops (no GraphFrames dependency).

Algorithm: iterative hash-to-min label propagation — every node starts
labeled with itself; each round a node takes the min label among itself and
its neighbors; converged when no label changes. Rounds = component
diameter + 1, and each round is one shuffle join + one hash aggregate.
Near-dup clusters are small and dense (diameter ≤ ~3), so this settles in
a handful of rounds; for adversarial long-chain graphs the upgrade is
alternating large-star/small-star (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14), which converges in O(log n) rounds —
same building blocks, different edge rewrite per round.

Scale notes: labels are localCheckpoint'd each round so the plan does not
grow with iterations; the per-round shuffle is keyed by node id (near-
unique, no skew). The driver-side loop is control flow only — no data ever
reaches the driver except the one converged-count per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Component label per node: (node, component) with component = min
    node id reachable. Edges are undirected; nodes not in any edge are not
    emitted (an isolated doc is trivially its own cluster)."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # Checkpoint the symmetrized edge list BEFORE the loop: its lineage is
    # the entire upstream pair-finder (minhash banding join / LSH bucket
    # join) and every round's actions would otherwise be free to re-derive
    # it — measured at sf0.1 this one checkpoint is worth ~2× on the full
    # dedup chain.
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), F.col("label"))
        new_labels = (
            neighbor_labels.unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("new_label"))
        )
        # checkpoint FIRST, then read the convergence count off the
        # materialized rows — one execution of the join+agg per round,
        # not one for the count and another for the checkpoint
        joined = labels.join(new_labels, "node").localCheckpoint(eager=True)
        changed = joined.filter(F.col("new_label") < F.col("label")).count()
        labels = joined.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_keep_filter(
    docs: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every clustered document except its cluster representative
    (the min doc id = the component label). Docs in no cluster pass
    through — the standard keep-one-per-near-dup-group policy."""
    losers = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("__loser")
    )
    return docs.join(
        losers, docs[id_col] == F.col("__loser"), "left_anti"
    )
