"""Distributed connected components (alternating star algorithm).

The step a real dedup pipeline runs AFTER pair generation: MinHash/LSH or
fingerprint grouping emits duplicate *pairs* (edges); picking one canonical
document per duplicate *cluster* requires the connected components of that
pair graph (A~B and B~C must collapse to ONE keeper even though A and C
never met in any bucket).

The reference has no graph surface at all (its streams are 1-D,
SURVEY.md §1.1); this enters via the driver's LLM-data mandate as the
closure of the dedup family (catalog/dedup.py).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", ACM SoCC 2014) — the
standard shuffle-based CC used at web scale:

- large_star: every node points its LARGER neighbors at the minimum of
  its neighborhood (incl. itself).
- small_star: every node points its smaller-or-equal neighbors (and
  itself) at that minimum.

Each round is two groupBy-min + join passes over the edge list — partial
aggregation applies, no step ever materializes a whole component in one
task, and the edge list monotonically contracts toward a star per
component. Converges in O(log n) rounds (proof in the paper; in practice
dedup graphs are unions of near-cliques and finish in 2-4 rounds).

Scale notes (100 TB):
- State per round is only the edge list — shuffled on node id, never
  grouped into unbounded structures (contrast: label-propagation via
  collect_set explodes on the giant component).
- Lineage is truncated every round with localCheckpoint(eager=True) —
  without it the plan tree grows ~4x per round and analysis time
  explodes exponentially. On a real cluster prefer
  sc.setCheckpointDir(...) + .checkpoint() for fault tolerance across
  executor loss; localCheckpoint keeps blocks on executors (fine for
  local[n], documented tradeoff).
- Convergence is detected from one tiny aggregate per round
  (count + order-insensitive hash-sum of edges), not by diffing edge
  sets (which would be a full extra join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """(v, m) for every edge (u,v) with v > u, where m = min(N(u) ∪ {u})."""
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.least("mn", F.col("u")).alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges downward (u > v), then point every low neighbor and u
    itself at the minimum of the low neighborhood."""
    down = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = down.groupBy("u").agg(F.min("v").alias("mn"))
    nbrs = down.join(mins, "u").select(F.col("v").alias("n"), F.col("mn"))
    selfs = mins.select(F.col("u").alias("n"), F.col("mn"))
    return (
        nbrs.union(selfs)
        .filter(F.col("n") != F.col("mn"))
        .select(F.col("n").alias("u"), F.col("mn").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns DataFrame[node, component] covering every node that appears in
    at least one edge; component = the minimum node id of its component
    (callers union isolated nodes back as component = self — see
    catalog/dedup.py::dedup_cluster).

    Node ids must be orderable (int/long/string). Self-loops and duplicate
    / reversed edges are tolerated.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iter):
        # LAZY checkpoint: the signature aggregate below is the round's
        # only action and materializes the contracted edge set into the
        # checkpoint as it computes — one job per round instead of two
        # (kmeans_fit's r16 fusion; lineage truncation unchanged)
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # bit_xor, not sum: order-insensitive, immune to ANSI long
        # overflow, and exact because the edge set is distinct
        sig = e2.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        e.unpersist()
        e = e2
        if sig == prev_sig:
            break
        prev_sig = sig
    # Converged state is a star per component: every edge is
    # (member, component-min). A member can appear once; the min node
    # appears only on the v side. groupBy is belt-and-braces for the
    # max_iter-hit case (still a valid contraction, just maybe not a star).
    members = e.groupBy("u").agg(F.min("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("u"))
        .distinct()
        .join(members.select("u"), "u", "left_anti")
        .select("u", F.col("u").alias("component"))
    )
    return members.union(roots).select(F.col("u").alias("node"), "component")


def kcore_converged(sym: DataFrame, k: int, with_rounds: bool = False):
    """k-core peel RUN TO QUIESCENCE — the full fixpoint the registered
    graph_kcore's bounded unrolled form (catalog/analytics.py, 5 rounds;
    fixpoint at gate scale by test) is the oracle-expressible prefix of.
    Repeatedly deletes every node with degree < k from the SYMMETRIC
    edge table ``sym(a, b)`` until a round removes nothing, detected by
    the edge count going flat (peeling is monotone — the edge set only
    shrinks, so an unchanged count IS quiescence, no content hash
    needed). Returns the surviving edges; degree-per-node is one
    aggregate away (the connected_components convergence-loop template,
    same localCheckpoint-per-round lineage truncation).

    Scale: identical per-round cost to the bounded form — one
    partial-agg degree count + two semi-joins of the shrinking edge
    table against the survivor set (AQE broadcasts survivors when they
    fit); the driver-side loop adds one O(1) count per round, and round
    count is bounded by graph structure (a peel cascade removes >= 1
    node per round, worst-case O(|V|), in practice a handful).

    ``with_rounds=True`` returns (edges, rounds) where rounds counts
    the peel iterations executed INCLUDING the flat-detection one —
    the loop's convergence certificate the registered
    kcore_converged qkey exposes as a column (catalog/analytics.py).
    """
    e = sym.localCheckpoint(eager=True)
    prev = e.count()
    rounds = 0
    while True:
        surv = (
            e.groupBy("a").agg(F.count("*").alias("d")).filter(F.col("d") >= k).select("a")
        )
        e2 = (
            e.join(surv, "a", "left_semi")
            .join(surv.select(F.col("a").alias("b")), "b", "left_semi")
            # lazy: the count below materializes the round (see above)
            .localCheckpoint(eager=False)
        )
        n = e2.count()
        e.unpersist()
        e = e2
        rounds += 1
        if n == prev:
            return (e, rounds) if with_rounds else e
        prev = n
