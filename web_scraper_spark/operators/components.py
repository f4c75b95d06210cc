"""Connected components over the duplicate-pair graph — the cluster
step that turns near-dup PAIRS into dedup DECISIONS.

LSH/SimHash/embedding banding emit pairs (a,b); transitive closure
groups them into clusters so exactly one representative per cluster
survives (what SlimPajama/CCNet-style pipelines run after MinHash).
Pairwise "drop b of every pair" over-deletes: in a chain a-b, b-c,
dropping every pair-right kills b AND c even though c only duplicates
the already-dropped b.

Algorithm: iterative min-label propagation (the standard map-reduce
CC; Kang et al.'s HCC / "hash-to-min" family). Every node starts with
label = its own id; each step every node adopts the minimum label in
its closed neighborhood; converged when no label changes. Rounds
needed ≤ graph diameter for this simple variant — duplicate clusters
are dense (near-cliques from banding), so diameters are tiny; the
convergence flag is computed inside the relabel projection and read
out by the same job that materializes the per-iteration checkpoint
(one Spark job per iteration), and lineage is checkpoint-broken per
iteration like the PageRank loop.

Plan shape at 10^10 nodes: each iteration is one equi-join on node id
+ one min-aggregate — both shuffles on the id key, data-proportional
in the EDGE set (pairs), which banding already bounded. No driver
state beyond the converged flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_keep_representatives"]


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from it.

    Stops early when an iteration changes no label; the changed count
    comes from the same job that materializes the iteration (no extra
    convergence job). For typical dedup graphs (dense near-cliques)
    this is 2-3 iterations; ``max_iter`` bounds adversarial chains.
    """
    # materialize the narrow edge projection before the symmetric
    # union: both union branches scan it, so an expensive upstream
    # (LSH banding, the hreflang HTML parse) would otherwise run twice
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    # undirected: union both directions so every endpoint appears as
    # `src` and one min-aggregate covers the whole neighborhood
    # one extra up-front shuffle to pin the (constant, largest) join
    # side on the per-iteration join key: every iteration joins sym on
    # ``dst``, and a dst-partitioned cache lets the planner skip sym's
    # exchange each round — only the (smaller, changing) labels side
    # shuffles per iteration
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(F.col("dst"))
        .persist()
    )
    # iteration 1 fused into initialization: with identity labels the
    # neighborhood minimum of node v is just least(v, min(neighbors)),
    # so one groupBy replaces the node-list distinct PLUS the first
    # propagate round's join
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("component"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=False)
    )

    for _ in range(max_iter - 1):
        # one propagate round in TWO shuffles: join neighbor labels in
        # (on the dst key sym is pre-partitioned by), then union the
        # node's own label and take one min-aggregate — the own-label
        # branch both closes the neighborhood and keeps degree-0 nodes.
        # The change flag rides the same aggregate (own label recovered
        # via the `own` marker), and the NON-eager localCheckpoint is
        # materialized by the count itself — ONE Spark job per
        # iteration does relabel + lineage break + convergence check.
        contrib = sym.join(labels, sym.dst == labels.node).select(
            "src", "component", F.lit(False).alias("__own")
        )
        own = labels.select(
            F.col("node").alias("src"), "component", F.lit(True).alias("__own")
        )
        new_labels = (
            contrib.unionByName(own)
            .groupBy("src")
            .agg(
                F.min("component").alias("component"),
                (
                    F.min("component")
                    < F.max(F.when(F.col("__own"), F.col("component")))
                ).alias("__changed"),
            )
            .withColumnRenamed("src", "node")
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter("__changed").count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_keep_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "doc_a",
    right_col: str = "doc_b",
) -> DataFrame:
    """Keep exactly one document per duplicate cluster (the minimum
    id — deterministic) plus every unpaired document. Input ``pairs``
    is any near-dup pair set (LSH-verified, SimHash radius, embedding
    bands); output preserves ``docs``'s schema."""
    comp = connected_components(pairs, src_col=left_col, dst_col=right_col)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
