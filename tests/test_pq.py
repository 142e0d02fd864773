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
