"""Large-star/small-star CC must match min-label CC exactly."""

from __future__ import annotations

import random

from spookystuff_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _cc_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_star_matches_minlabel_on_random_graph(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = _cc_map(connected_components(df, "src", "dst", local_threshold=0))
    b = _cc_map(connected_components_star(df, "src", "dst"))
    assert a == b


def test_star_handles_long_chain_in_few_rounds(spark):
    # a 200-hop chain: min-label would need 200 rounds; star needs O(log n)
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _cc_map(connected_components_star(df, "src", "dst", max_iter=12))
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_star_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components_star(df, "src", "dst").count() == 0


def test_star_self_loops_and_duplicates(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (3, 3)], "src long, dst long"
    )
    got = _cc_map(connected_components_star(df, "src", "dst"))
    # 3 has only a self-loop — drops out of the edge list entirely (matches
    # the undirected-edge semantics of connected_components on (3,3))
    assert got[1] == 1 and got[2] == 1
