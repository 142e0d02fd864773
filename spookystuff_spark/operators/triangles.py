"""Distributed triangle counting via degree-ordered node-iterator.

Classic MapReduce formulation (Suri & Vassilvitskii, WWW'11 "Counting
Triangles and the Curse of the Last Reducer"): orient every undirected
edge from its lower-(degree, id) endpoint to the higher one, enumerate
wedges only at each edge's SOURCE, and close them against the oriented
edge set. Orientation bounds per-node out-degree by O(sqrt(m)), so the
wedge join materializes O(m^1.5) rows worst-case instead of the
O(sum deg^2) a naive node-iterator pays — the "last reducer" (a celebrity
node with 10^7 neighbors) never enumerates its own wedge explosion,
because a max-degree node is the *destination* of all its edges.

Every triangle {x, y, z} with rank(x) < rank(y) < rank(z) is counted
exactly once: at its lowest-rank corner x, as wedge (x→y, x→z) closed by
the oriented edge y→z.

Scale shape: two shuffles (degree agg + the wedge self-join on src) plus
one closing join keyed on (src, dst) — all map-side-combinable or
AQE-skew-splittable. The degree frame is node-cardinality-sized; Spark
broadcasts it when small, shuffles otherwise.
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
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_dst"),
    )

    o1 = oriented.select("src", F.col("dst").alias("v"), F.col("deg_dst").alias("dv"))
    o2 = oriented.select("src", F.col("dst").alias("w"), F.col("deg_dst").alias("dw"))
    wedges = o1.join(o2, "src").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
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
