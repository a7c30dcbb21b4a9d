"""Distributed iterative graph computation (beyond-parity).

The reference's only graph-shaped operation is near-duplicate clustering
(connected components, implemented in ``dedup.py``); this module adds the
other canonical iterative graph kernel — PageRank — as a pure DataFrame
loop, demonstrating that the engine handles fixed-point iteration over an
edge relation at scale (the shape behind link-based corpus quality scores
such as Common Crawl's harmonic-centrality filtering).

Scale shape: each iteration is exactly one shuffle — ``edges ⋈ ranks`` on
``src`` (ranks are O(nodes), a sliver of O(edges), and ride a broadcast)
followed by a ``groupBy(dst)`` with a map-side partial sum. Edges, degrees
and per-edge contributions are computed once and persisted; every rank
generation persists (tiny) so no round is ever recomputed by a later
round's broadcast build; lineage truncates every 3 rounds so the plan
stays bounded on deep iteration counts. The only driver-side values are
two O(1) scalars (node count, edge count) — the rank table itself never
leaves the executors except as each round's broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cut_lineage

__all__ = [
    "bfs_hops",
    "kcore",
    "label_propagation_min",
    "pagerank",
    "triangles",
    "triangles_degree_ordered",
]


def triangles(edges: DataFrame, src: str = "s1", dst: str = "s2") -> DataFrame:
    """Enumerate the triangles of an undirected graph given as ORIENTED
    edges (one row per edge with ``src < dst``) → ``(a, b, c)`` with
    ``a < b < c``, each triangle exactly once.

    The classic two-join enumeration: wedges ``(a,b)⋈(b,c)`` on the
    middle vertex, then a membership join against the edge set for the
    closing edge ``(a,c)``. Ordering every edge low→high is the standard
    orientation trick — each triangle is generated from exactly one of
    its three wedges, so no post-dedup pass and no 3× overcount. (The
    stronger degree-ordering orientation — orient toward the
    higher-degree endpoint — bounds wedge fanout by O(m^1.5) on skewed
    graphs; with id-ordering the bound is per-vertex out-degree, which is
    what the caller controls via its edge-construction threshold.)

    Scale shape: two shuffles (wedge join on ``b``, membership join on
    ``(a,c)``), both plain equi-joins AQE can re-plan; nothing driver-side,
    nothing quadratic in the graph — only in per-vertex out-degree.
    """
    e1 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e2 = edges.select(F.col(src).alias("b"), F.col(dst).alias("c"))
    wedges = e1.join(e2, "b")
    closing = edges.select(F.col(src).alias("a"), F.col(dst).alias("c"))
    return wedges.join(closing, ["a", "c"]).select("a", "b", "c")

def triangles_degree_ordered(
    edges: DataFrame, src: str = "s1", dst: str = "s2"
) -> DataFrame:
    """``triangles`` with DEGREE-ordered orientation — the skew-robust
    enumeration. Input/output contract is identical (id-oriented edges in,
    ``(a, b, c)`` with ``a < b < c`` out, each triangle once); only the
    internal orientation differs: every edge points toward its
    higher-``(degree, id)`` endpoint, wedges are the OUT-OUT pairs of the
    lowest-ordered vertex, and the closing edge is looked up in the same
    oriented relation.

    Why: with id-ordering, wedge fanout at a vertex is C(out-degree, 2)
    where out-degree can be the vertex's full degree (a hub with many
    higher-id neighbors). Degree-ordering bounds every out-degree by
    O(√m) — a vertex of degree d > √m has all its ≥d-degree neighbors
    capped at 2m/d < 2√m of them — giving the classic Σ C(outdeg,2) =
    O(m^1.5) total wedge bound REGARDLESS of skew (Schank & Wagner 2005's
    forward algorithm, relationally). On a star graph the id-ordered form
    generates C(hub_outdeg, 2) wedges; this form generates O(m). Measured
    in tests/test_graph.py::test_degree_ordering_bounds_star_wedges.

    Cost: one extra degree aggregation (O(m) shuffle) and two degree
    joins before the same two enumeration equi-joins — the trade that
    wins whenever the graph has hubs, i.e. every real co-occurrence or
    link graph at 100 TB.
    """
    deg = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    with_deg = (
        edges.join(deg.withColumnRenamed("node", src), src)
        .withColumnRenamed("_deg", "_ds")
        .join(deg.withColumnRenamed("node", dst), dst)
        .withColumnRenamed("_deg", "_dd")
    )
    lo_first = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col(src) < F.col(dst))
    )
    o = with_deg.select(
        F.when(lo_first, F.col(src)).otherwise(F.col(dst)).alias("u"),
        F.when(lo_first, F.col(dst)).otherwise(F.col(src)).alias("v"),
        F.when(lo_first, F.col("_dd")).otherwise(F.col("_ds")).alias("_dv"),
    )
    l = o.select("u", F.col("v").alias("x"), F.col("_dv").alias("_dx"))
    r = o.select("u", F.col("v").alias("y"), F.col("_dv").alias("_dy"))
    wedges = l.join(r, "u").filter(
        (F.col("_dx") < F.col("_dy"))
        | ((F.col("_dx") == F.col("_dy")) & (F.col("x") < F.col("y")))
    )
    closed = wedges.join(
        o.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"]
    )
    tri = closed.select(
        F.array_sort(F.array("u", "x", "y")).alias("_t")
    )
    return tri.select(
        F.element_at("_t", 1).alias("a"),
        F.element_at("_t", 2).alias("b"),
        F.element_at("_t", 3).alias("c"),
    )


# target edges per cached partition for the iteration loop: below this,
# per-task scheduling overhead dominates the ~μs of compute per row
# (measured at sf0.1: 32 partitions → 1.6× slower rounds than 4);
# above it, partitions stay shuffle-block-friendly. The partition count
# is clamped to defaultParallelism so billion-edge graphs still use the
# whole cluster.
_EDGES_PER_PARTITION = 250_000


def pagerank(
    edges: DataFrame,
    iterations: int = 6,
    damping: float = 0.85,
    reliable: bool = False,
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
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
    but no out-edges (sinks) are outside the node set entirely — they
    neither hold nor re-emit rank, so mass sent to them leaks. Nodes with
    out-edges but NO in-edges are handled correctly (they keep the base
    term and keep contributing — the round update left-joins from the
    node set, not from the contribution table). Use the undirected
    (symmetrized) form when mass conservation matters.

    ``weight_col`` switches to the WEIGHTED walk: a contribution is
    proportional to its edge's weight over the source's total outgoing
    weight (duplicate (src, dst) pairs sum; weights must be strictly
    positive — checked). Callers wanting cross-engine-exact results pass
    weights that are themselves order-independent (e.g. a decimal sum
    cast to double). ``weight_col=None`` is the classic uniform split
    and computes bit-identically to the unweighted implementation
    (unit weights sum to the exact out-degree).

    ``seeds`` (a 1-column ``node`` DataFrame) switches to PERSONALIZED
    PageRank (random walk with restart): the teleport mass (1-d) lands
    only on seed nodes — restricted to seeds that exist in the node set —
    instead of uniformly, so ranks measure proximity TO the seed set
    (the "find everything related to these" primitive: expanding a
    labeled subset, contamination neighborhoods, account rings). With
    ``seeds=None`` the update is the classic uniform-teleport one.

    At billion-node scale (ranks beyond broadcast): pre-hash-partition the
    contribution table by ``src`` once and repartition each rank
    generation to the same layout instead of broadcasting — the join then
    still moves only the rank table. (Measured slower here: the cached
    SMJ re-sorts the big side every round at toy scale.)
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    sc = edges.sparkSession.sparkContext
    if weight_col is None:
        e = edges.select(F.col("src"), F.col("dst")).distinct()
        e = e.withColumn("_w", F.lit(1.0)).persist()
    else:
        # weighted walk: duplicate (src, dst) pairs sum their weights;
        # contributions are proportional to weight / Σ_out weights. The
        # weight keeps its NATIVE type through both aggregations — pass a
        # DECIMAL for cross-engine-exact totals (a double weight would
        # make Σ_out order-dependent and drift across engines over the
        # rounds); the cast to double happens only at the one division.
        e = (
            edges.groupBy("src", "dst")
            .agg(F.sum(F.col(weight_col)).alias("_w"))
            .persist()
        )
    n_edges = e.count()  # O(1) to the driver; also materializes the cache
    if n_edges == 0:
        e.unpersist()
        return edges.select(F.col("src").alias("node"), F.lit(0.0).alias("pr")).limit(0)
    # deg and contrib_e get plain persist(), NOT cut_lineage: their lineage
    # is one hop off the cached edges, and localCheckpoint's plan-to-RDD
    # conversion eagerly builds any broadcast join in the plan on the
    # driver (OOMs a default-sized driver heap under AQE) — the same
    # gotcha spread()'s docstring records for df.rdd.
    deg = (
        e.groupBy("src")
        .agg(F.sum("_w").alias("outdeg"))  # unweighted: _w = 1.0 → count
        .select(F.col("src").alias("node"), "outdeg")
        .persist()
    )
    n = deg.count()  # node count — O(1) scalar, folds the base term

    if weight_col is not None:
        bad = deg.filter(F.col("outdeg") <= 0).count()
        if bad:
            raise ValueError(
                f"{bad} node(s) have non-positive total edge weight — "
                "weighted PageRank needs strictly positive weights"
            )

    n_parts = max(2, min(sc.defaultParallelism, -(-n_edges // _EDGES_PER_PARTITION)))
    # contribution edges: (src, dst, weight/Σ_out) — the division is hoisted
    # out of the loop; each iteration then only multiplies and sums.
    contrib_e = (
        e.join(deg, e["src"] == deg["node"])
        .select(
            "src",
            "dst",
            (F.col("_w").cast("double") / F.col("outdeg").cast("double")).alias(
                "inv_deg"
            ),
        )
        .coalesce(n_parts)
        .persist()
    )

    if seeds is None:
        base = (1.0 - damping) / n
        nodes = deg.select("node").withColumn("_base", F.lit(base))
        ranks = deg.select("node", F.lit(1.0 / n).alias("pr"))
    else:
        # personalized: teleport mass only on seeds ∩ node set
        sd = seeds.select("node").distinct()
        nodes = deg.select("node").join(
            F.broadcast(sd.withColumn("_is_seed", F.lit(True))), "node", "left"
        )
        n_seeds = nodes.filter("_is_seed").count()
        if n_seeds == 0:
            raise ValueError("no seed appears in the graph's node set")
        nodes = nodes.select(
            "node",
            F.when(F.col("_is_seed"), F.lit((1.0 - damping) / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("_base"),
        )
        ranks = nodes.select(
            "node",
            F.when(F.col("_base") > 0, F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("pr"),
        )  # init = 1/|S| on seeds, 0 elsewhere (stated directly — a
        #    derived base/(1-d) would differ from the oracle's 1/|S| by ulps
    nodes = nodes.persist()
    generations = []
    for it in range(iterations):
        # each product quantizes to DECIMAL(38,30) before the sum — the
        # repo's order-independent-sum pattern: the per-dst aggregation
        # becomes exact, so round-to-round values are reproducible across
        # partitionings AND engines (a plain double sum drifted past the
        # 9-sig-digit oracle tolerance on the weighted variant by round
        # 6). A double can never sit exactly on a 1e-30 decimal tie, so
        # both engines' cast rounding agrees everywhere.
        contribs = (
            contrib_e.join(F.broadcast(ranks), contrib_e["src"] == ranks["node"])
            .groupBy("dst")
            .agg(
                F.sum(
                    (F.col("pr") * F.col("inv_deg")).cast("decimal(38,30)")
                )
                .cast("double")
                .alias("in_sum")
            )
        )
        # LEFT join from the node set, not contribs alone: a node with
        # out-edges but NO in-edges (possible in directed graphs) receives
        # zero contributions yet must keep its base rank and keep
        # contributing next round — dropping it would silently leak its
        # outgoing mass from round 2 on
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left_outer"
        ).select(
            "node",
            (
                F.col("_base")
                + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
            ).alias("pr"),
        )
        # EVERY generation persists (it is O(nodes) — tiny): round i+1's
        # broadcast build executes round i's plan once into the cache, so
        # no round is ever recomputed. Without this, each broadcast build
        # re-runs every round since the last materialization (measured
        # ~3× the total runtime at sf0.1). Lineage additionally truncates
        # every 3 rounds to bound plan depth on deep iteration counts.
        if (it + 1) % 3 == 0 and it + 1 < iterations:
            ranks = cut_lineage(ranks, reliable)
        ranks = ranks.persist()
        generations.append(ranks)
    # materialize the final generation, then release every intermediate —
    # bench loops call queries repeatedly, so leaked cache blocks compound
    # (same fix heavy_hitters needed, ADVICE r5).
    out = generations.pop()
    out.count()
    for h in (e, deg, contrib_e, nodes, *generations):
        h.unpersist()
    return out


def bfs_hops(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Min-hop distance from a seed set, capped at ``max_hops`` rounds
    (multi-source BFS over a directed ``(src, dst)`` edge relation).

    Returns ``(node, hops)`` for every node reachable within ``max_hops``
    — seeds at 0, whether or not they appear in the graph. Integer-exact
    and round-bounded, so the whole computation restates as ``max_hops``
    unrolled CTEs (``d_i = min over (d_{i-1} ∪ d_{i-1}⋈edges+1)``) that
    run verbatim on DuckDB AND spark.sql.

    Scale shape: round i joins only the FRONTIER (nodes first reached at
    hop i-1) against the edge relation — the classic delta-BFS, so total
    join work is O(edges touched), not O(rounds × edges). The reached set
    stays persisted per round (it is O(nodes)); the frontier shrinks to
    empty and rounds short-circuit (the unrolled oracle computes the same
    fixpoint — extra rounds past exhaustion are no-ops in both engines).
    Billion-edge note: pre-partition ``edges`` by src once (done here via
    one repartition + persist) so every round's join reuses the same
    layout and only the tiny frontier moves.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    # Join keys must share ONE declared type: cast seeds to the edge
    # relation's src type (so bigint ids stay bigint — no silent
    # string<->bigint coercion, and the output `node` keeps the caller's
    # id type). String seeds against string edges are unchanged.
    node_t = edges.schema["src"].dataType
    e = (
        edges.select(F.col("src").cast(node_t), F.col("dst").cast(node_t))
        .distinct().repartition("src").persist()
    )
    dist = seeds.select(F.col("node").cast(node_t).alias("node")) \
        .distinct().withColumn("hops", F.lit(0)).persist()
    frontier = dist
    handles = [e, dist]
    for i in range(1, max_hops + 1):
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            cand.join(dist, "node", "left_anti")
            .withColumn("hops", F.lit(i))
            .persist()
        )
        if new.isEmpty():
            new.unpersist()
            break
        dist = dist.unionByName(new).persist()
        handles.extend([new, dist])
        frontier = new
    out = dist.select("node", F.col("hops").cast("int").alias("hops"))
    out = out.persist()
    out.count()
    for h in handles:
        h.unpersist()
    return out


def label_propagation_min(
    edges: DataFrame, rounds: int = 3
) -> DataFrame:
    """Synchronous min-label propagation over a directed ``(src, dst)``
    edge relation for a FIXED number of rounds: every node starts with
    its own id as label; each round every node takes the min of its own
    label and its in-neighbors' labels. After enough rounds this is
    connected components (labels = component-min id); with bounded
    ``rounds`` it is the deterministic, oracle-comparable prefix — the
    same fixed-rounds-not-convergence choice as ``pagerank``. Callers
    wanting undirected semantics symmetrize the edges first.

    Returns ``(node, label)`` for every node in the graph. Integer/
    string-exact (min over a total order), so the whole computation
    restates as ``rounds`` unrolled SQL CTEs that run verbatim on DuckDB
    AND spark.sql.

    Scale shape (delta form): round i joins only the CHANGED set (nodes
    whose label improved in round i-1) against the edge relation — the
    same frontier trick as ``bfs_hops``, so per-round join work tracks
    label churn, not O(edges) forever; the label table update is one
    min-merge groupBy. Edges are repartitioned by src once and persisted
    so every round reuses the layout.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    node_t = edges.schema["src"].dataType
    e = (
        edges.select(F.col("src").cast(node_t), F.col("dst").cast(node_t))
        .distinct()
        .repartition("src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("label", F.col("node")).persist()
    changed = labels
    handles = [e, labels]
    for _ in range(rounds):
        prop = (
            changed.join(e, changed["node"] == e["src"])
            .select(F.col("dst").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("_new"))
        )
        merged = (
            labels.join(prop, "node", "left_outer")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_new"), F.col("label"))
                ).alias("label"),
                (
                    F.col("_new").isNotNull()
                    & (F.col("_new") < F.col("label"))
                ).alias("_chg"),
            )
            .persist()
        )
        nxt_changed = merged.filter(F.col("_chg")).select("node", "label")
        labels = merged.select("node", "label")
        handles.append(merged)
        if nxt_changed.isEmpty():
            break
        changed = nxt_changed
    out = labels.persist()
    out.count()
    for h in handles:
        h.unpersist()
    return out


def shortest_paths(
    edges: DataFrame, seeds: DataFrame, rounds: int = 3
) -> DataFrame:
    """Bounded-round weighted shortest paths from a seed set
    (multi-source Bellman-Ford) over a directed ``(src, dst, w)`` edge
    relation with non-negative integer weights.

    ``rounds`` synchronous relaxations: ``d_i(v) = min(d_{i-1}(v),
    min over in-edges (d_{i-1}(u) + w))`` with seeds at 0 — so ``d_i``
    is the exact min-weight over paths of ≤ i edges, the same
    fixed-rounds-not-convergence contract as ``bfs_hops`` (which this
    generalizes: unit weights ⇒ hop counts). Integer-exact throughout,
    so the whole computation restates as ``rounds`` unrolled min-merge
    SQL CTEs that run verbatim on DuckDB AND spark.sql.

    Returns ``(node, dist)`` for every node reachable within ``rounds``
    edges. Parallel edges should be pre-minimized by the caller (or are
    harmless — MIN absorbs them).

    Scale shape (delta form): round i relaxes only the CHANGED set
    (nodes whose distance improved in round i-1) against the
    src-partitioned edge relation, so per-round join work tracks
    improvement churn, not O(edges) per round; the distance update is
    one min-merge groupBy over O(reached nodes). Edges repartition by
    src once and stay persisted; rounds short-circuit when no distance
    improves.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    node_t = edges.schema["src"].dataType
    e = (
        edges.select(
            F.col("src").cast(node_t),
            F.col("dst").cast(node_t),
            F.col("w").cast("bigint"),
        )
        .repartition("src")
        .persist()
    )
    dist = (
        seeds.select(F.col("node").cast(node_t).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .persist()
    )
    changed = dist
    handles = [e, dist]
    for _ in range(rounds):
        relaxed = (
            changed.join(e, changed["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("_new"))
        )
        merged = (
            dist.join(relaxed, "node", "full_outer")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.col("_new")),
                    F.coalesce(F.col("_new"), F.col("dist")),
                ).alias("dist"),
                (
                    F.col("_new").isNotNull()
                    & (F.col("dist").isNull() | (F.col("_new") < F.col("dist")))
                ).alias("_chg"),
            )
            .persist()
        )
        nxt_changed = merged.filter(F.col("_chg")).select("node", "dist")
        dist = merged.select("node", "dist")
        handles.append(merged)
        if nxt_changed.isEmpty():
            break
        changed = nxt_changed
    out = dist.persist()
    out.count()
    for h in handles:
        h.unpersist()
    return out


def kcore(edges: DataFrame, k: int, rounds: int = 3) -> DataFrame:
    """Fixed-rounds k-core peeling over an UNDIRECTED edge relation given
    as BOTH directions (``src``, ``dst``; symmetrize first, as for
    ``label_propagation_min``): each round computes every node's degree
    in the surviving subgraph, drops nodes with degree < ``k``, and keeps
    only edges whose both endpoints survive. ``rounds`` is fixed — not
    run to fixpoint — so the result is a deterministic, oracle-unrollable
    prefix of the true k-core (the same fixed-rounds choice as
    ``pagerank``/``label_propagation_min``). Returns ``(node, deg)`` over
    the edge set surviving the LAST peel: nodes whose every neighbor was
    peeled disappear with their edges.

    Scale shape: each round is one degree aggregate (map-side combinable,
    one row per node) plus two semi-joins of the edge relation against
    the surviving-node set. The edge relation is repartitioned by src
    once and persisted per generation, so the src-side semi-join reuses
    the layout; peeling monotonically shrinks the edge set, so per-round
    cost tracks the surviving subgraph, not the input. Early-exits when a
    peel removes nothing (the subgraph is then stable for all later
    rounds).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.select("src", "dst").distinct().repartition("src").persist()
    handles = [e]
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        keep = deg.filter(F.col("_deg") >= k).select("src").persist()
        nxt = (
            e.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .repartition("src")
            .persist()
        )
        handles.extend([keep, nxt])
        stable = nxt.count() == e.count()
        e = nxt
        if stable:
            break
    out = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .persist()
    )
    out.count()
    for h in handles:
        h.unpersist()
    return out
