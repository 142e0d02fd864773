"""PageRank / CCNet-buckets / DSIR: closed-form checks, layout invariance,
and oracle parity for the round-4 graph-analytics and data-selection ops."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_harness import compare, duck_con


def test_pagerank_closed_form_two_node_cycle(spark):
    """a↔b: perfectly symmetric, every iteration keeps rank = scale // 2
    exactly (base 75_000_000 + 85% of 425_000_000 = 500_000_000)."""
    from spookystuff_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {
        r["node"]: r["rank_nano"]
        for r in pagerank(edges, iterations=5).collect()
    }
    assert got == {"a": 500_000_000, "b": 500_000_000}


def test_pagerank_star_graph_integer_recurrence(spark):
    """Hub with 3 leaves, all edges leaf→hub: replicate the integer
    recurrence in plain python and require bit equality."""
    from spookystuff_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("l1", "h"), ("l2", "h"), ("l3", "h")], "src string, dst string"
    )
    scale, n = 1_000_000_000, 4
    base = (scale * 15) // (100 * n)
    leaf, hub = scale // n, scale // n
    for _ in range(8):
        incoming = 3 * (leaf // 1)  # each leaf out-degree 1
        hub_next = base + (85 * incoming) // 100
        leaf = base  # leaves have no in-edges
        hub = hub_next
    got = {
        r["node"]: r["rank_nano"]
        for r in pagerank(edges, iterations=8).collect()
    }
    assert got == {"h": hub, "l1": leaf, "l2": leaf, "l3": leaf}


def test_pagerank_partition_layout_invariant(spark):
    """Integer arithmetic ⇒ bit-identical ranks under any repartitioning."""
    from spookystuff_spark.operators.graph import pagerank

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    pairs = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    a = sorted(
        (r["node"], r["rank_nano"])
        for r in pagerank(edges, iterations=4).collect()
    )
    b = sorted(
        (r["node"], r["rank_nano"])
        for r in pagerank(edges.repartition(7), iterations=4).collect()
    )
    assert a == b and len(a) > 0


def test_pagerank_oracle_parity_smoke(spark):
    from spookystuff_spark.queries.graph_ops import (
        ORACLE_PAGERANK,
        q_pagerank_purchases,
    )

    con = duck_con(SF_SMOKE)
    compare(
        q_pagerank_purchases(spark, SF_SMOKE),
        con.sql(ORACLE_PAGERANK).df(),
        "q_pagerank_purchases",
    )


def test_ccnet_buckets_oracle_parity(spark):
    from spookystuff_spark.queries.graph_ops import (
        ORACLE_CCNET,
        q_ccnet_buckets,
    )

    con = duck_con(SF_CORRECT)
    compare(
        q_ccnet_buckets(spark, SF_CORRECT),
        con.sql(ORACLE_CCNET).df(),
        "q_ccnet_buckets",
    )


def test_ccnet_tercile_shape(spark):
    """Per language: bucket sizes differ by ≤1 and head docs outscore tail."""
    from spookystuff_spark.queries.graph_ops import q_ccnet_buckets

    rows = q_ccnet_buckets(spark, SF_SMOKE).collect()
    by_lang: dict[str, dict[str, list]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(
            r["score"]
        )
    for lang, buckets in by_lang.items():
        sizes = [len(v) for v in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        if "head" in buckets and "tail" in buckets:
            assert min(buckets["head"]) >= max(buckets["tail"]), lang


def test_dsir_oracle_parity(spark):
    from spookystuff_spark.queries.graph_ops import (
        ORACLE_DSIR,
        q_dsir_select,
    )

    con = duck_con(SF_CORRECT)
    compare(
        q_dsir_select(spark, SF_CORRECT),
        con.sql(ORACLE_DSIR).df(),
        "q_dsir_select",
    )


def test_dsir_prefers_target_like_docs(spark):
    """Docs from the target language must dominate the selected set — the
    whole point of importance resampling toward a target distribution."""
    from spookystuff_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    sel = dsir_select(docs, target, "doc_id", "text", k=50)
    picked = sel.join(docs.select("doc_id", "lang"), "doc_id")
    n_en = picked.filter(F.col("lang") == "en").count()
    n_en_corpus = target.count()
    n_corpus = docs.count()
    # selected EN fraction must beat the corpus EN base rate
    assert n_en / 50 > n_en_corpus / n_corpus


def test_dsir_layout_invariant(spark):
    """Quantized weights + doc-id tiebreak ⇒ same selection after shuffle."""
    from spookystuff_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    a = sorted(
        r["doc_id"]
        for r in dsir_select(docs, target, "doc_id", "text", k=20).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in dsir_select(
            docs.repartition(13), target.repartition(5), "doc_id", "text", k=20
        ).collect()
    )
    assert a == b and len(a) == 20


def test_pagerank_zero_iterations_returns_uniform_init(spark):
    """iterations=0 = the uniform init distribution, not a crash
    (ADVICE r4 regression)."""
    from spookystuff_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {
        r["node"]: r["rank_nano"]
        for r in pagerank(edges, iterations=0).collect()
    }
    assert got == {
        "a": 1_000_000_000 // 3,
        "b": 1_000_000_000 // 3,
        "c": 1_000_000_000 // 3,
    }
