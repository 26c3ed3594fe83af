"""Distributed connected components — the clustering step of the dedup
pipeline (near-dup PAIRS -> duplicate CLUSTERS -> one representative per
cluster).

The reference has no graph surface at all; this is the standard
alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame ops:

- each round is two phases, each ONE groupBy-min plus ONE equi-join on
  node ids (uniform keys — no skew beyond the component structure
  itself, and a hot star collapses rather than grows: every edge it
  emits points at its minimum);
- the edge set only ever connects nodes of the same original component
  (both phases emit edges inside Gamma+(u)), and converges to flat
  stars (v -> component-min) in O(log^2 n) rounds — ~3 rounds on
  real near-dup graphs, whose components are tiny and dense;
- per-round driver work is one 1-row count (the convergence probe);
  lineage is cut with localCheckpoint so the iterative plan does not
  compound.

Convergence is checked on the OUTPUT CONTRACT, not on reaching a
theoretical fixpoint: labels extracted from the current star set are
accepted exactly when every input edge has both endpoints labeled
identically. That check is sufficient for correctness, not just
plausible: label(v) is v or a smaller same-component node (edges stay
inside components and point high->low), so the component's true minimum
m can never carry a label below itself -> label(m) = m; edge-wise
agreement makes the label constant across each component (components
are, by definition, edge-connected); hence the constant is m.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Edge list as deduped (hi, lo) pairs with lo < hi; self-loops
    dropped. Works for any orderable id type (longs, strings)."""
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.least(F.col(src), F.col(dst)).alias("lo"),
        )
        .dropDuplicates()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Gamma+(u))."""
    sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionAll(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("u"), F.col("mn"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), m.alias("lo"))
        .filter(F.col("hi") != F.col("lo"))
        .dropDuplicates()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller neighbor of u (and u itself) to the
    minimum of u's smaller neighborhood."""
    mins = e.groupBy("hi").agg(F.min("lo").alias("mn"))
    to_lo = (
        e.join(mins, "hi")
        .filter(F.col("lo") != F.col("mn"))
        .select(F.col("lo").alias("hi"), F.col("mn").alias("lo"))
    )
    to_hi = mins.select("hi", F.col("mn").alias("lo"))
    return to_lo.unionAll(to_hi).dropDuplicates()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """(node, component) for every node incident to ``edges`` (self-
    loops carry no connectivity and are ignored), where ``component``
    is the MINIMUM node id of the node's connected component —
    deterministic, so cluster representatives are stable across runs
    and engines.

    Cost model at scale: each round shuffles the current edge set twice
    (groupBy node + join on node); the edge set starts at |E| and only
    shrinks once stars form. Rounds are O(log^2 n) worst-case and 2-4
    in practice for near-dup graphs. The only driver-side work per
    round is a single-row count — no collect of graph data ever.
    """
    # one materialization of the (possibly expensive) upstream edge
    # plan; nodes and the convergence-check edge set derive from it
    orig = _canonical(edges, src, dst).localCheckpoint()
    e = orig
    nodes = (
        orig.select(F.col("hi").alias("node"))
        .unionAll(orig.select(F.col("lo").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        labels = nodes.join(
            e.groupBy("hi").agg(F.min("lo").alias("component")),
            nodes.node == F.col("hi"),
            "left",
        ).select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
        # contract check (see module docstring): every original edge's
        # endpoints agree -> labels ARE the component minima
        la = labels.withColumnRenamed("node", "hi").withColumnRenamed(
            "component", "c_hi"
        )
        lb = labels.withColumnRenamed("node", "lo").withColumnRenamed(
            "component", "c_lo"
        )
        disagree = (
            orig.join(la, "hi")
            .join(lb, "lo")
            .filter(F.col("c_hi") != F.col("c_lo"))
        )
        if disagree.isEmpty():
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
        " (theoretical bound is O(log^2 n) — this indicates a bug or"
        " a pathological id type)"
    )
