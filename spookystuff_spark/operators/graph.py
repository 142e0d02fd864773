"""Graph traversal over DataFrames — the relational twin of plans/explore.py.

Same iterative skeleton as ExplorePlan (ref: execution/ExplorePlan.scala:53-228)
but the expansion is an edge-table join instead of an agent fetch — the shape a
100 TB pipeline uses for link graphs already landed in a table.

Scale: per epoch one join frontier⋈edges (broadcast when edges fit, else
shuffle on src) + one left_anti vs visited keyed only on the node id;
localCheckpoint every k epochs truncates the growing lineage.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bfs(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    depth_field: str = "depth",
    max_depth: int = 10,
    broadcast_edges: bool = False,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Min-depth BFS closure: returns (node, depth) for every reachable node.

    ``seeds``: DataFrame with ``node_col``. Diamond paths resolve to min depth
    (PathPlanning_Simple.scala:24-58 reducer parity).
    """
    frontier = seeds.select(F.col(node_col)).distinct().withColumn(
        depth_field, F.lit(0)
    )
    visited = frontier
    edge_sel = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    )
    if broadcast_edges:
        edge_sel = F.broadcast(edge_sel)

    depth = 0
    while depth < max_depth:
        children = (
            frontier.join(edge_sel, frontier[node_col] == edge_sel["__src"])
            .select(
                F.col("__dst").alias(node_col),
                (F.col(depth_field) + 1).alias(depth_field),
            )
            .distinct()
        )
        frontier = children.join(
            visited.select(node_col), on=node_col, how="left_anti"
        )
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        visited = visited.unionByName(frontier)
        if depth % checkpoint_interval == checkpoint_interval - 1:
            visited = visited.localCheckpoint(eager=True)
        depth += 1

    return visited.groupBy(node_col).agg(F.min(depth_field).alias(depth_field))


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components via iterative min-label propagation — the operator
    that turns near-duplicate PAIRS into dedup CLUSTERS (pick min id per
    component as the canonical representative).

    Min-label propagation: each node adopts the smallest label in its
    neighborhood until fixpoint. Per iteration: one groupBy shuffle keyed on
    node id; converges in O(component diameter) rounds — tiny for near-dup
    clusters (dense, star-like); lineage cut by localCheckpoint each round.
    Works on any edge list (ids of any orderable type).
    """
    import pyspark.sql.functions as F2

    # hybrid: near-dup edge lists are usually tiny relative to the corpus —
    # under the threshold, a driver-side union-find beats O(diameter) Spark
    # rounds by seconds of fixed job overhead. Same output, same determinism.
    # Materialize the (typically expensive: minhash/simhash upstream) edge
    # list ONCE, then gate with limit(threshold+1) off the materialized copy:
    # no full count pass, no CollectLimit scale-up recomputation, and the
    # distributed path below reuses the same materialization every iteration
    # instead of re-deriving the pair set (countApprox idiom,
    # ref: LocalityRDDView.scala:13-16).
    edges = edges.select(src_col, dst_col).localCheckpoint(eager=True)
    gated = edges.limit(local_threshold + 1).collect()
    if len(gated) <= local_threshold:
        pairs = [(r[0], r[1]) for r in gated]
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                # min label wins (matches the distributed reducer)
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = sorted({x for p in pairs for x in p})
        rows = [(n, find(n)) for n in nodes]
        spark = edges.sparkSession
        # explicit schema: no sampling-based inference, and an empty edge
        # list (nothing near-duplicated) must yield an empty frame, not a
        # CANNOT_INFER_EMPTY_SCHEMA error
        from pyspark.sql.types import StructField, StructType

        t = edges.schema[src_col].dataType
        schema = StructType(
            [StructField("node", t), StructField("component", t)]
        )
        return spark.createDataFrame(rows, schema)

    # undirected edge list, both directions
    fwd = edges.select(F2.col(src_col).alias("a"), F2.col(dst_col).alias("b"))
    sym = fwd.unionByName(
        edges.select(F2.col(dst_col).alias("a"), F2.col(src_col).alias("b"))
    ).distinct()

    # label(node) = min(node, min neighbor label); iterate to fixpoint
    labels = (
        sym.select(F2.col("a").alias("node"))
        .distinct()
        .withColumn("label", F2.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F2.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F2.least(
                    F2.col("label"), F2.coalesce(F2.col("nbr_label"), F2.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F2.col("n.label") != F2.col("o.label"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            break
    if not converged:
        # a silently-split component is a wrong answer, not a slow one
        raise RuntimeError(
            f"connected_components: no fixpoint after max_iter={max_iter} "
            "rounds — a component with diameter > max_iter would be split "
            "into multiple labels; raise max_iter"
        )
    return labels.select("node", F2.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n) rounds vs min-label propagation's O(diameter), so it
    is the scale path for long-chain graphs (lineage chains, link graphs)
    where ``connected_components`` needs a round per hop.

    large-star: each node u links every LARGER neighbor to
    m = min(N(u) ∪ {u}); small-star (on edges oriented larger→smaller): each
    u links its smaller neighbors and itself to the minimum. Each round is
    two groupBy shuffles over an O(E)-bounded edge list. Output matches
    ``connected_components`` exactly: (node, component = min id reachable).
    """
    import pyspark.sql.functions as F2

    a, b = F2.col("a"), F2.col("b")

    def canon(e: DataFrame) -> DataFrame:
        # store undirected edges larger-first, dedup, drop self-loops
        return (
            e.select(
                F2.greatest(a, b).alias("a"), F2.least(a, b).alias("b")
            )
            .where(a != b)
            .distinct()
        )

    cur = canon(
        edges.select(F2.col(src_col).alias("a"), F2.col(dst_col).alias("b"))
    ).localCheckpoint(eager=True)

    if cur.isEmpty():
        from pyspark.sql.types import StructField, StructType

        t = edges.schema[src_col].dataType
        return edges.sparkSession.createDataFrame(
            [], StructType([StructField("node", t), StructField("component", t)])
        )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(e.select(b.alias("a"), a.alias("b")))
        m = sym.groupBy("a").agg(F2.min("b").alias("mn"))
        mm = F2.least(F2.col("mn"), a).alias("m")
        j = sym.join(m, "a").select(a, b, mm)
        # emit (v, m) for every neighbor v > u
        return canon(
            j.where(b > a).select(b.alias("a"), F2.col("m").alias("b"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        # e is larger-first: group by the larger endpoint
        m = e.groupBy("a").agg(F2.min("b").alias("m"))
        j = e.join(m, "a")
        moved = j.select(b.alias("a"), F2.col("m").alias("b"))
        self_link = j.select(a, F2.col("m").alias("b"))
        return canon(moved.unionByName(self_link))

    for _ in range(max_iter):
        after = small_star(large_star(cur)).localCheckpoint(eager=True)
        stable = (
            after.exceptAll(cur).isEmpty() and cur.exceptAll(after).isEmpty()
        )
        cur = after
        if stable:
            break
    else:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_iter} rounds"
        )
    # at fixpoint edges are (node, component-min) stars; roots map to selves
    stars = cur.select(a.alias("node"), b.alias("component"))
    roots = (
        stars.select(F2.col("component").alias("node"))
        .distinct()
        .withColumn("component", F2.col("node"))
    )
    return stars.unionByName(roots).distinct()


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 8,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
    checkpoint_interval: int = 3,
    assume_distinct: bool = False,
) -> DataFrame:
    """Deterministic integer-arithmetic PageRank → (node, rank_nano).

    Ranks live in ``scale``-denominated BIGINT units and every update is
    integer math — ``contrib = rank div out_degree``, ``rank' = base +
    (damping_pct · Σ contrib) div 100`` — so the result is bit-identical
    across partitionings, summation orders, and engines (the DuckDB oracle
    unrolls the same recurrence; float PageRank would differ in the last ulp
    per engine). Dangling-node mass is dropped (the classic simplification:
    total rank decays, relative order is what PageRank is used for).

    Scale shape — the standard Pregel-on-DataFrames layout, with the edge
    exchange hoisted OUT of the loop: the degree-annotated edge table is
    hash-partitioned on ``__src`` once and persisted, and every iteration's
    rank frame is produced hash-partitioned on ``node`` with the same
    partition count, so the per-iteration join re-shuffles neither side —
    the only recurring exchange is the partial-aggregated contribution sum
    (node-cardinality, tiny next to the edge table). Rank state is never
    broadcast or collected: at web scale the node table is billions of rows
    and only ever moves through hash exchanges. Lineage is truncated every
    ``checkpoint_interval`` iterations (lazily — one traversal at the final
    action, no intermediate job submissions).

    ``assume_distinct=True`` skips the edge dedup shuffle when the caller
    already guarantees unique (src, dst) rows.
    """
    from pyspark.sql import Window as W

    spark = edges.sparkSession
    num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    e = edges.select(F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"))
    if not assume_distinct:
        e = e.distinct()
    # ONE exchange builds the loop-side edge table: the explicit repartition
    # hash-clusters on __src, and the degree window then runs in place (its
    # required distribution is already satisfied). The cached partitioning
    # is what the per-iteration join reuses.
    ed = (
        e.repartition(num_parts, "__src")
        .withColumn("__outd", F.count(F.lit(1)).over(W.partitionBy("__src")))
        .persist()
    )
    # nodes read the edge CACHE twice (no recompute of the caller's lineage);
    # dropDuplicates after the hash repartition dedups in place.
    nodes = (
        ed.select(F.col("__src").alias("node"))
        .unionByName(ed.select(F.col("__dst").alias("node")))
        .repartition(num_parts, "node")
        .dropDuplicates()
        .persist()
    )
    n = nodes.count()
    init = scale // n
    base = (scale * (100 - damping_pct)) // (100 * n)

    if iterations <= 0:
        # zero iterations = the uniform init distribution (ADVICE r4: the
        # ranks-only rewrite crashed here on a None join)
        out = nodes.select(
            "node", F.lit(init).cast("long").alias("rank_nano")
        ).localCheckpoint(eager=True)
        for cached in (ed, nodes):
            cached.unpersist()
        return out

    # Rank state holds ONLY nodes with in-edges (exactly the keys the
    # contribution sum produces); any absent node's rank is by construction
    # exactly `init` before the first iteration and exactly `base` after —
    # integer math makes that identity precise, so the per-iteration
    # nodes-join of the textbook layout is unnecessary. Each iteration is
    # one no-exchange join against the cached edge table plus one
    # partial-aggregated contribution shuffle (node-cardinality).
    ranks: DataFrame | None = None
    for i in range(iterations):
        if ranks is None:
            joined = ed
            c = F.expr(f"{init}L div __outd")
        else:
            joined = ed.join(ranks, ed["__src"] == ranks["node"], "left")
            c = F.expr(f"coalesce(r, {base}L) div __outd")
        ranks = (
            joined.select(F.col("__dst").alias("node"), c.alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * s) div 100")
                ).cast("long").alias("r"),
            )
        )
        if i % checkpoint_interval == checkpoint_interval - 1:
            ranks = ranks.localCheckpoint(eager=False)

    out = (
        nodes.join(ranks, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("r"), F.lit(base)).cast("long").alias("rank_nano"),
        )
        .localCheckpoint(eager=True)
    )
    for cached in (ed, nodes):
        cached.unpersist()
    return out
