"""Product quantization: determinism, compression shape, ADC recall."""

from __future__ import annotations

import numpy as np
import pytest

from spookystuff_spark.operators.pq import pq_encode, pq_topk, train_codebooks
from spookystuff_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF, "embeddings").cache()


@pytest.fixture(scope="module")
def books(emb):
    return train_codebooks(emb, m=8, k=16)


def test_codebook_shape_and_determinism(emb, books):
    assert books.shape == (8, 16, 8)
    again = train_codebooks(emb, m=8, k=16)
    assert np.array_equal(books, again)


def test_encode_partition_invariant(emb, books):
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb.repartition(9), books).collect()
    }
    assert a == b
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in a.values())


def test_adc_recall_vs_bruteforce(spark, emb, books):
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    x = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    queries = [(int(ids[i]), x[i]) for i in range(3)]
    got = pq_topk(emb, queries, books, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert set(by_q) == {int(ids[i]) for i in range(3)}
    hits = total = 0
    for qid, qv in queries:
        d2 = ((x - qv) ** 2).sum(axis=1)
        exact5 = set(ids[np.argsort(d2, kind="stable")[:5]])
        hits += len(exact5 & set(by_q[qid]))
        total += 5
    recall = hits / total
    assert recall >= 0.5, f"ADC recall@5 too low: {recall}"


def test_adc_self_is_top1(emb, books):
    import pandas as pd  # noqa: F401

    pdf = emb.limit(1).toPandas()
    qid = int(pdf["vec_id"][0])
    qv = np.asarray(pdf["embedding"][0], dtype=np.float64)
    top = pq_topk(emb, [(qid, qv)], books, k=1).collect()[0]
    assert top["vec_id"] == qid  # own code word is the nearest ADC candidate


def test_ivfpq_recall_and_partition_invariance(spark, emb):
    from spookystuff_spark.operators.pq import ivfpq_topk

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    x = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    queries = [(int(ids[i]), x[i]) for i in range(3)]

    def recall(res):
        by_q = {}
        for r in res:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = total = 0
        for qid, qv in queries:
            d2 = ((x - qv) ** 2).sum(axis=1)
            exact5 = set(ids[np.argsort(d2, kind="stable")[:5]])
            hits += len(exact5 & by_q[qid])
            total += 5
        return by_q, hits / total

    got = ivfpq_topk(emb, queries, n_cells=8, nprobe=3, k=5).collect()
    by_q, rec3 = recall(got)
    assert set(by_q) == {int(ids[i]) for i in range(3)}
    for qid, _ in queries:
        assert qid in by_q[qid]  # residual code of the query itself wins
    # nprobe is the recall knob: probing every cell can only help
    full = ivfpq_topk(emb, queries, n_cells=8, nprobe=8, k=5).collect()
    _, rec8 = recall(full)
    assert rec8 >= rec3 > 0
    # exact agreement with an independent numpy replica of the index
    from spookystuff_spark.operators.pq import _kmeans_fp, _pairwise_d2

    m, sub = 8, 8
    coarse = _kmeans_fp(x, 8)
    cell = _pairwise_d2(x, coarse).argmin(axis=1)
    r = x - coarse[cell]
    books = [
        _kmeans_fp(np.ascontiguousarray(r[:, j * sub : (j + 1) * sub]), 16)
        for j in range(m)
    ]
    rcodes = np.stack(
        [
            _pairwise_d2(
                np.ascontiguousarray(r[:, j * sub : (j + 1) * sub]), books[j]
            ).argmin(axis=1)
            for j in range(m)
        ],
        axis=1,
    )
    for qid, qv in queries:
        qi_cells = np.argsort(_pairwise_d2(qv[None], coarse)[0])[:8]
        d2 = np.full(len(x), np.inf)
        for c in qi_cells:
            mask = cell == c
            if not mask.any():
                continue
            qr = qv - coarse[c]
            tabs = [
                _pairwise_d2(qr[None, j * sub : (j + 1) * sub], books[j])[0]
                for j in range(m)
            ]
            d2[mask] = sum(t[rcodes[mask][:, j]] for j, t in enumerate(tabs))
        d2 = np.round(d2 + 1e-6, 6)
        order = sorted(range(len(x)), key=lambda i: (d2[i], ids[i]))[:5]
        expected = [int(ids[i]) for i in order]
        got_ranked = [
            v
            for _, v in sorted(
                (r_["rank"], r_["vec_id"])
                for r_ in full
                if r_["query_id"] == qid
            )
        ]
        assert got_ranked == expected
    # partition invariance
    again = ivfpq_topk(emb.repartition(7), queries, n_cells=8, nprobe=3, k=5).collect()
    a = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in got)
    b = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in again)
    assert a == b
