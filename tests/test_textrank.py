"""TextRank (operators/textrank.py): graph construction, convergence
sanity, partition-layout bit-reproducibility."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.operators.textrank import textrank, token_edges

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_edges_symmetric_no_self_loops(spark, docs):
    e = token_edges(docs).cache()
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    fwd = set(map(tuple, e.select("src", "dst", "w").collect()))
    assert fwd == {(b, a, w) for a, b, w in fwd}  # undirected
    e.unpersist()


def test_textrank_scores_positive_and_ordered(spark, docs):
    rows = textrank(docs, top_k=10).collect()
    assert len(rows) == 10
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["rank"] > 0 for r in rows)
    assert [r["rank_pos"] for r in rows] == list(range(1, 11))


def test_textrank_bit_identical_across_layouts(spark, docs):
    a = sorted(map(tuple, textrank(docs, n_iter=6).collect()))
    b = sorted(map(tuple, textrank(docs.repartition(13), n_iter=6).collect()))
    assert a == b  # exact equality, not approximate: quantized sums


def test_textrank_matches_local_pagerank(spark, docs):
    """Independent in-test replica (same quantization contract as
    tools/gen_goldens.py gold_textrank) must agree exactly."""
    import math
    from collections import defaultdict

    quant = float(1 << 40)
    wdir = defaultdict(int)
    for (t,) in docs.select("text").collect():
        toks = (t or "").lower().split()
        for x, y in zip(toks, toks[1:]):
            if x != y:
                wdir[(x, y)] += 1
    wsym = defaultdict(int)
    for (x, y), w in wdir.items():
        wsym[(x, y)] += w
        wsym[(y, x)] += w
    out_w = defaultdict(int)
    for (x, y), w in wsym.items():
        out_w[x] += w
    share = {k: w / out_w[k[0]] for k, w in wsym.items()}
    r = {t: 1.0 for t in out_w}
    for _ in range(4):
        acc = defaultdict(int)
        for (x, y), s in share.items():
            acc[y] += math.floor(s * r[x] * quant)
        r = {t: 0.15000000000000002 + 0.85 * (float(v) / quant) for t, v in acc.items()}
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    expected = [(t, round(v + 1e-6, 6), i + 1) for i, (t, v) in enumerate(top)]
    got = [tuple(x) for x in textrank(docs, n_iter=4, top_k=5).collect()]
    assert got == expected
