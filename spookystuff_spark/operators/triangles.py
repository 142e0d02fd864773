"""Distributed triangle counting via degree-ordered edge iteration.

Degree orientation (Suri & Vassilvitskii, WWW'11 "Counting Triangles and
the Curse of the Last Reducer"): orient every undirected edge from its
lower-(degree, id) endpoint to the higher one. Orientation bounds
per-node OUT-degree by O(sqrt(m)) — the "last reducer" (a celebrity node
with 10^7 neighbors) never enumerates its own neighborhood explosion,
because a max-degree node is the *destination* of all its edges.

Counting uses the edge-iterator/intersection form rather than the
materialized wedge join: per oriented edge (u, v), triangles(u, v) =
|N+(u) ∩ N+(v)|, summed over edges. Every triangle {x, y, z} with
rank(x) < rank(y) < rank(z) is counted exactly once — at edge (x, y),
closed by z ∈ N+(x) ∩ N+(y). Total intersection work is the same
O(m^1.5) bound as the wedge join, but the O(m^1.5) wedge ROWS are never
shuffled: the only exchanges are the degree agg, the adjacency-list
groupBy, and two edge-cardinality joins carrying O(sqrt(m))-bounded
neighbor arrays. The intersection itself is a single whole-stage-codegen
``array_intersect`` — no Python, no explosion.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def undirected_degrees(edges: DataFrame) -> DataFrame:
    """edges: distinct (a, b) with a < b. → (node, deg)."""
    return (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """edges: DISTINCT undirected (a, b), a < b.

    → one row: (n_nodes, n_edges, n_triangles, n_wedges, gcc) where
    n_wedges = sum over nodes of C(deg, 2) and gcc = 3*triangles/wedges
    (global clustering coefficient, rounded to 6 decimals).
    """
    # edges feed three consumers (degrees, orientation, edge count) and
    # oriented feeds three more (adjacency + both join sides) — checkpoint
    # lazily so each lineage is computed once, not per consumer
    edges = edges.localCheckpoint(eager=False)
    deg = undirected_degrees(edges)

    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ranked = edges.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=False)

    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    au = adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nv"))
    # left join for the dst side: a rank-maximal endpoint has no out-edges
    per_edge = (
        oriented.join(au, oriented["src"] == au["u"])
        .join(av, oriented["dst"] == av["v"], "left")
        .select(
            F.size(
                # slice(nu, 1, 0) = empty array of the node type (nu is
                # never null on the inner-joined side) — keeps the operator
                # generic over node id types
                F.array_intersect("nu", F.coalesce("nv", F.slice("nu", 1, 0)))
            ).alias("t")
        )
    )
    tri = per_edge.agg(
        F.coalesce(F.sum("t"), F.lit(0)).alias("n_triangles")
    )

    totals = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("CAST(sum(deg * (deg - 1) DIV 2) AS BIGINT)").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))

    # three 1-row frames — broadcast-combined, no shuffle
    return (
        totals.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            "n_wedges",
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("gcc"),
        )
    )


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected part co-purchase graph: an edge (a < b) iff parts a and b
    appear in the same order. Built order-local (groupBy orderkey →
    in-array pair expansion), so no self-join: baskets are small (~7
    lines/order at any TPC-H scale), pair expansion is O(basket²) per
    order, and the only shuffles are the orderkey groupBy and the final
    distinct."""
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("parts"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("parts"),
                            i + 2,
                            F.greatest(F.size("parts") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return pairs.distinct()
