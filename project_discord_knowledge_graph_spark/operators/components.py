"""Connected components over an edge DataFrame (canonicalization).

The reference documents entity canonicalization ("Normalize all
entity variants", extraction/README.md:128) but never implements it;
BASELINE.json makes it a requirement: "canonicalization by
connected-components (iterative large-star/small-star over an edge
DataFrame)".

Implementation: the real Alternating Algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — each round
applies one large-star then one small-star contraction, which
converges in O(log^2 n) rounds even on pathological long-chain graphs
(plain min-label propagation needs O(diameter) rounds; see
tests/test_entity_graph.py::test_long_chain_converges).

- large-star(u): with Gamma(u) the symmetric neighborhood and
  m = min(Gamma(u) ∪ {u}), emit (v, m) for every neighbor v > u.
- small-star(u): orient every edge toward its larger endpoint, so
  Gamma(u) holds only neighbors <= u; with m = min(Gamma(u) ∪ {u}),
  emit (v, m) for every v in Gamma(u) ∪ {u}.

At the fixpoint the edge set is a star forest: every node points at
its component's minimum id.

Scale notes:
- each half-round is one groupBy(min) + one equi-join on the edge
  list; AQE skew-join splitting (on in session.py) handles hub nodes.
- convergence is detected by an order-insensitive fingerprint
  (count + bit_xor(xxhash64(u,v)) over the distinct edge set), checked
  every `check_every` rounds.  The default of 1 is deliberate: a
  fingerprint is ONE aggregate pass while a round is three shuffles,
  so detecting convergence a round late costs more than checking every
  round; raise check_every only if profiling shows the check dominating
  (very deep graphs with many rounds).
- lineage is cut at every convergence check; `reliable_checkpoint=True`
  uses `df.checkpoint()` (requires spark.sparkContext.setCheckpointDir)
  so a lost executor cannot force a full-chain recompute at scale —
  localCheckpoint (default) keeps blocks in executor memory and is the
  right choice for local mode.
- non-convergence within max_iter raises (or warns with
  on_nonconverged='warn') instead of silently returning wrong labels.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

logger = logging.getLogger(__name__)


def _large_star(edges: DataFrame) -> DataFrame:
    """Emit (v, min(Gamma(u) ∪ {u})) for every neighbor v > u.

    No distinct here: duplicate edges don't change the following
    small-star's groupBy(min), and dropping the extra exchange saves
    one shuffle per round (small-star's final distinct restores set
    semantics before the fingerprint counts rows)."""
    nbr = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (nbr.groupBy("u").agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m")))
    return (nbr.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v")))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the larger endpoint; attach each smaller
    neighborhood (plus the center) to its minimum."""
    oriented = (edges.select(F.greatest("u", "v").alias("u"),
                             F.least("u", "v").alias("v"))
                .where(F.col("u") != F.col("v")))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    star = (oriented.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v")))
    center = mins.select(F.col("u"), F.col("m").alias("v"))
    return (star.unionByName(center)
            .where(F.col("u") != F.col("v"))
            .distinct())


def _fingerprint(edges: DataFrame) -> tuple:
    row = edges.agg(F.count(F.lit(1)).alias("n"),
                    F.expr("bit_xor(xxhash64(u, v))").alias("h")).first()
    return (row.n, row.h)


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         check_every: int = 1,
                         reliable_checkpoint: bool = False,
                         on_nonconverged: str = "raise",
                         return_stats: bool = False):
    """edges(src, dst) -> (node, component) with component = min
    member id of the node's connected component (ids compare by the
    column's natural ordering; strings compare lexicographically).

    Isolated self-loop nodes keep their own id as the component.
    With return_stats=True also returns {'rounds': int,
    'converged': bool} (each round = one large-star + one small-star).
    """
    e0 = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
          .where(F.col("u").isNotNull() & F.col("v").isNotNull()))
    nodes = (e0.select("u").unionByName(e0.select(F.col("v").alias("u")))
             .distinct().withColumnRenamed("u", "node"))

    cur = (e0.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())

    prev_fp = None
    converged = False
    rounds = 0
    for it in range(max_iter):
        cur = _small_star(_large_star(cur))
        rounds = it + 1
        if rounds % check_every == 0 or rounds == max_iter:
            cur = (cur.checkpoint(eager=True) if reliable_checkpoint
                   else cur.localCheckpoint(eager=True))
            fp = _fingerprint(cur)
            if fp == prev_fp:
                converged = True
                break
            prev_fp = fp

    if not converged:
        msg = (f"connected_components did not converge within "
               f"{max_iter} rounds (last fingerprint {prev_fp})")
        if on_nonconverged == "warn":
            logger.warning(msg)
        else:
            raise RuntimeError(msg)

    labels = (nodes.join(cur.select(F.col("u").alias("node"),
                                    F.col("v").alias("component")),
                         "node", "left")
              .groupBy("node")
              .agg(F.min(F.coalesce("component", "node"))
                   .alias("component")))
    if return_stats:
        return labels, {"rounds": rounds, "converged": converged}
    return labels
