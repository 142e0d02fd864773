"""Partition-layout invariance of driver-side trainer samples.

Round-3 verdict items #2/#4: the IVF training sample was an unsorted
``limit()`` (order- AND membership-sensitive to partitioning); PQ's sample was
id-sorted but membership above the cap still depended on which rows ``limit``
grabbed. Both now go through ``operators/sampling.canonical_sample``
(smallest-md5(id) membership, id order). These tests pin:

* ``canonical_sample`` returns the identical matrix across repartitionings of
  a corpus ~3x larger than the cap;
* ``train_codebooks`` (PQ) produces bit-identical codebooks across
  ``repartition(3)`` vs ``repartition(17)`` above the cap;
* ``ivf_topk_pairs`` output is invariant under ``repartition(7)`` (the
  assertion test_pq.py already runs for IVFPQ).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from spookystuff_spark.operators.pq import train_codebooks
from spookystuff_spark.operators.sampling import canonical_sample
from spookystuff_spark.operators.similarity import ivf_topk_pairs

DIM = 8
N = 150
CAP = 50


@pytest.fixture(scope="module")
def big_corpus(spark):
    """N rows of seed-fixed vectors, ~3x the sample cap."""
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((N, DIM))
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_canonical_sample_layout_independent(big_corpus):
    a = canonical_sample(big_corpus.repartition(3), "vec_id", "embedding", CAP)
    b = canonical_sample(big_corpus.repartition(17), "vec_id", "embedding", CAP)
    c = canonical_sample(big_corpus.coalesce(1), "vec_id", "embedding", CAP)
    assert a.shape == (CAP, DIM)
    assert np.array_equal(a, b)
    assert np.array_equal(a, c)


def test_canonical_sample_matches_numpy_replica(big_corpus):
    import hashlib

    pdf = big_corpus.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    mat = np.vstack(pdf["embedding"].to_numpy())
    h = np.array([hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids])
    member = np.argsort(h, kind="stable")[:CAP]
    member = member[np.argsort(ids[member], kind="stable")]
    expected = mat[member]
    got = canonical_sample(big_corpus, "vec_id", "embedding", CAP)
    assert np.array_equal(got, expected)


def test_pq_codebooks_layout_independent_above_cap(big_corpus):
    a = train_codebooks(big_corpus.repartition(3), m=2, k=4, sample_cap=CAP)
    b = train_codebooks(big_corpus.repartition(17), m=2, k=4, sample_cap=CAP)
    assert np.array_equal(a, b)


def test_ivf_topk_repartition_invariant(big_corpus):
    def run(df):
        got = ivf_topk_pairs(
            df, "vec_id", "embedding", DIM, k=3, n_cells=4, nprobe=2
        ).collect()
        return sorted((r["qid"], r["rn"], r["vec_id"], r["cos_sim"]) for r in got)

    a = run(big_corpus.repartition(7))
    b = run(big_corpus.repartition(2))
    assert a == b and len(a) > 0
