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


def _local_finish(edges: DataFrame) -> DataFrame:
    """Single-task union-find over the residual edge list -> star
    forest (node, min-of-component), the same fixpoint shape the
    alternating rounds converge to.

    This is the hybrid finisher: each alternating round costs three
    shuffles and ~1.5 s of scheduling floor in local mode (constant
    in data volume — measured in BENCH.md), while the edge list
    shrinks geometrically; once it is below local_finish_threshold
    the remaining O(log n) rounds are pure floor.  One
    coalesce(1) + Arrow-batched mapInPandas task replaces them all.
    Python here is BOUNDED small-side work (<= threshold rows, the
    same exemption class as lineage/multimodal): when the INPUT is
    already under the threshold the finisher absorbs the whole graph
    with zero rounds (still bounded — that is what the threshold
    means); above it, the distributed rounds do the data-volume work
    and the finisher only ever sees the shrunken convergence tail.
    Union always attaches the larger root under the smaller, so each
    final root is its component's minimum id — byte-identical labels
    to the pure alternating fixpoint."""
    schema = edges.schema

    def fin(batches):
        import pandas as pd
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for a, b in zip(pdf["u"].tolist(), pdf["v"].tolist()):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra == rb:
                    continue
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        us, vs = [], []
        for x in parent:
            r = find(x)
            if r != x:
                us.append(x)
                vs.append(r)
        yield pd.DataFrame({"u": us, "v": vs})

    return edges.coalesce(1).mapInPandas(fin, schema)


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         check_every: int = 1,
                         reliable_checkpoint: bool = False,
                         on_nonconverged: str = "raise",
                         local_finish_threshold: int = 1_000_000,
                         checkpoint_input: bool = True,
                         return_stats: bool = False):
    """edges(src, dst) -> (node, component) with component = min
    member id of the node's connected component (ids compare by the
    column's natural ordering; strings compare lexicographically).

    Isolated self-loop nodes keep their own id as the component.

    Hybrid execution: alternating large-star/small-star rounds while
    the edge list is big (that is where the data volume lives), then
    a single-task union-find finisher once the list drops to
    local_finish_threshold edges (see _local_finish) — identical
    labels, minus the per-round scheduling floor of the long
    convergence tail.  The default (1M edges) bounds the finisher
    task at roughly 0.5 GB for string ids — raise it only with the
    executor memory to back it.  Set local_finish_threshold=0 for the pure
    alternating algorithm (bench.py --cc uses that to measure the
    rounds-vs-log(n) trend).

    With return_stats=True also returns {'rounds': int, 'converged':
    bool, 'local_finish': bool, 'residual_edges': int} (each round =
    one large-star + one small-star; residual_edges = edge-list size
    the finisher absorbed, 0 when it never fired).
    """
    e0 = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
          .where(F.col("u").isNotNull() & F.col("v").isNotNull()))
    # Materialize the input edge list ONCE before fanning out: both
    # the node universe (below) and the contraction loop read e0, and
    # without the cut each action re-executes the caller's whole
    # upstream plan — for entity linking that is the full LSH blocking
    # + exact-verify chain, re-run just to list nodes (measured ~2
    # redundant upstream passes per call at sf1.0).  Same
    # localCheckpoint/checkpoint policy as the per-round cuts.
    # checkpoint_input=False skips the cut for callers whose edge
    # list is already materialized (near_dedup checkpoints its
    # verified pairs) or cheaper to recompute than to cache.
    if checkpoint_input:
        e0 = (e0.checkpoint(eager=True) if reliable_checkpoint
              else e0.localCheckpoint(eager=True))
    nodes = (e0.select("u").unionByName(e0.select(F.col("v").alias("u")))
             .distinct().withColumnRenamed("u", "node"))

    cur = (e0.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())

    prev_fp = None
    converged = False
    local_finish = False
    residual = 0
    rounds = 0
    for it in range(max_iter + 1):
        # the it=0 check exists ONLY to let the finisher absorb an
        # already-small input before any round; with the hybrid off
        # it would be a pure extra checkpoint+aggregate over the
        # largest edge list of the run — skip it (convergence can
        # never fire at it=0: prev_fp is None)
        if it == 0 and not local_finish_threshold:
            pass
        elif it % check_every == 0 or it == max_iter:
            cur = (cur.checkpoint(eager=True) if reliable_checkpoint
                   else cur.localCheckpoint(eager=True))
            fp = _fingerprint(cur)
            if fp == prev_fp:
                converged = True
                break
            prev_fp = fp
            if (local_finish_threshold
                    and fp[0] <= local_finish_threshold):
                residual = fp[0]
                cur = _local_finish(cur)
                converged = True
                local_finish = True
                break
        if it == max_iter:
            break
        cur = _small_star(_large_star(cur))
        rounds = it + 1

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
        return labels, {"rounds": rounds, "converged": converged,
                        "local_finish": local_finish,
                        "residual_edges": residual}
    return labels
