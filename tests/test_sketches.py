"""KMV pairwise set-overlap estimates (operators/sketch.py): accuracy vs
exact truth, exactness below k, and layout invariance."""

from __future__ import annotations

import pytest

# --------------------------------------------------- KMV pairwise overlap


def test_kmv_overlap_accuracy_vs_exact(spark):
    """Estimates land near truth on controlled sets: A = 0..999,
    B = 500..1499 → jaccard 1/3, containment(A in B) = 1/2."""
    from spookystuff_spark.operators.sketch import kmv_pairwise_overlap

    rows = [("A", v) for v in range(1000)] + [("B", v) for v in range(500, 1500)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_pairwise_overlap(df, "g", "v", k=256).collect()
    assert len(out) == 1
    r = out[0]
    assert r.group_a == "A" and r.group_b == "B"
    assert abs(r.jaccard - 1 / 3) < 0.12
    assert abs(r.est_union - 1500) / 1500 < 0.15
    assert abs(r.est_intersection - 500) / 500 < 0.35
    assert abs(r.containment_a_in_b - 0.5) < 0.18


def test_kmv_overlap_exact_below_k(spark):
    """Every group under k distinct values → every figure is EXACT."""
    from spookystuff_spark.operators.sketch import kmv_pairwise_overlap

    rows = [("A", v) for v in range(10)] + [("B", v) for v in range(5, 17)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_pairwise_overlap(df, "g", "v", k=64).collect()[0]
    assert r.est_a == 10.0 and r.est_b == 12.0 and r.est_union == 17.0
    assert r.est_intersection == 5.0
    assert abs(r.jaccard - 5 / 17) < 1e-5
    assert abs(r.containment_a_in_b - 0.5) < 1e-5


def test_kmv_overlap_layout_invariant(spark):
    from spookystuff_spark.operators.sketch import kmv_pairwise_overlap

    rows = [(f"g{i % 3}", (i * 37) % 211) for i in range(900)]
    df = spark.createDataFrame(rows, "g string, v long")
    a = kmv_pairwise_overlap(df.repartition(2), "g", "v", k=32).collect()
    b = kmv_pairwise_overlap(df.repartition(13), "g", "v", k=32).collect()
    key = lambda r: (r.group_a, r.group_b)
    assert sorted(a, key=key) == sorted(b, key=key)
