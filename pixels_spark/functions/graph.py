"""Distributed iterative graph computation (beyond-parity).

The reference's only graph-shaped operation is near-duplicate clustering
(connected components, implemented in ``dedup.py``); this module adds the
other canonical iterative graph kernel — PageRank — as a pure DataFrame
loop, demonstrating that the engine handles fixed-point iteration over an
edge relation at scale (the shape behind link-based corpus quality scores
such as Common Crawl's harmonic-centrality filtering).

Scale shape: each iteration is exactly one shuffle — ``edges ⋈ ranks`` on
``src`` (ranks are the small side and broadcast when they fit) followed by
a ``groupBy(dst)`` with a map-side partial sum. Edges and degrees are
computed once and persisted; lineage is truncated with ``cut_lineage``
every few iterations so the plan stays bounded on deep iteration counts.
Nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cut_lineage

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 6,
    damping: float = 0.85,
    reliable: bool = False,
) -> DataFrame:
    """PageRank over a directed edge relation ``(src, dst)``.

    Returns ``(node, pr)`` for every node that appears as a source
    (i.e. has at least one outgoing edge). Callers that want undirected
    semantics union the reversed edges first — then every node has
    outgoing edges and no rank mass dangles, so ``sum(pr) == 1`` exactly
    (up to float rounding), which the tests assert.

    The update is the textbook one: ``pr' = (1-d)/N + d * Σ_in pr/outdeg``
    for ``iterations`` fixed rounds (fixed rounds, not a convergence test,
    so the result is deterministic and oracle-comparable across engines).

    Dangling caveat (documented, not silently wrong): nodes with in-edges
    but no out-edges would leak rank mass under this update; such nodes
    are excluded from the result because they never receive the base term.
    Use the undirected (symmetrized) form when mass conservation matters.
    """
    e = cut_lineage(
        edges.select(F.col("src"), F.col("dst")).distinct(), reliable
    ).persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
    deg = cut_lineage(deg.select(F.col("src").alias("node"), "outdeg"), reliable).persist()
    n_nodes = deg.agg(F.count(F.lit(1)).cast("double").alias("n")).select("n")

    # contribution edges: (src, dst, 1/outdeg) — the division is hoisted out
    # of the loop; each iteration then only multiplies and sums.
    contrib_e = cut_lineage(
        e.join(deg, e["src"] == deg["node"]).select(
            "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("inv_deg")
        ),
        reliable,
    ).persist()

    base = F.lit(1.0 - damping) / F.col("n")
    ranks = deg.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    prev = None
    for it in range(iterations):
        contribs = (
            contrib_e.join(ranks, contrib_e["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("inv_deg")).alias("in_sum"))
        )
        ranks = (
            contribs.crossJoin(F.broadcast(n_nodes))
            .select(
                F.col("dst").alias("node"),
                (base + F.lit(damping) * F.col("in_sum")).alias("pr"),
            )
        )
        if (it + 1) % 3 == 0 and it + 1 < iterations:
            ranks = cut_lineage(ranks, reliable).persist()
            if prev is not None:
                prev.unpersist()
            prev = ranks
    # materialize the final generation, then release every intermediate —
    # bench loops call queries repeatedly, so leaked cache blocks compound
    # (same fix heavy_hitters needed, ADVICE r5).
    out = cut_lineage(ranks, reliable).persist()
    out.count()
    for h in (e, deg, contrib_e):
        h.unpersist()
    if prev is not None:
        prev.unpersist()
    return out
