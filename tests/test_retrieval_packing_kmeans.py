"""Round-3 operators: BM25 retrieval, sequence packing, hash split,
distributed k-means."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from spookystuff_spark.operators.kmeans import kmeans_assign
from spookystuff_spark.operators.packing import hash_split, pack_sequences, token_count
from spookystuff_spark.operators.retrieval import bm25_topk, postings, tfidf_vectors
from spookystuff_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF, "documents").cache()


def test_pack_covers_every_token_exactly_once(spark, docs):
    packed = pack_sequences(docs, seq_len=128, n_shards=4).cache()
    per_doc = packed.groupBy("doc_id").agg(
        F.sum("n_tok").alias("packed"),
        F.min("tok_start").alias("lo"),
        F.max("tok_end").alias("hi"),
    )
    truth = docs.select(
        "doc_id", token_count(F.col("text")).alias("toks")
    ).where(F.col("toks") > 0)
    joined = per_doc.join(truth, "doc_id")
    bad = joined.where(
        (F.col("packed") != F.col("toks"))
        | (F.col("lo") != 0)
        | (F.col("hi") != F.col("toks"))
    )
    assert bad.count() == 0
    assert joined.count() == truth.count()


def test_pack_sequences_are_exactly_full(spark, docs):
    packed = pack_sequences(docs, seq_len=128, n_shards=4)
    seqs = packed.groupBy("shard", "seq_id").agg(F.sum("n_tok").alias("filled"))
    last = seqs.groupBy("shard").agg(F.max("seq_id").alias("seq_id"))
    non_last = seqs.join(last, ["shard", "seq_id"], "left_anti")
    assert non_last.where(F.col("filled") != 128).count() == 0


def test_pack_span_offsets_consistent(spark, docs):
    packed = pack_sequences(docs, seq_len=128, n_shards=4)
    bad = packed.where(
        (F.col("n_tok") <= 0)
        | (F.col("seq_off") < 0)
        | (F.col("seq_off") + F.col("n_tok") > 128)
        | (F.col("tok_end") - F.col("tok_start") != F.col("n_tok"))
    )
    assert bad.count() == 0


def test_hash_split_stable_and_partition_invariant(spark, docs):
    a = hash_split(docs, "doc_id").select("doc_id", "split")
    b = hash_split(docs.repartition(13), "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    counts = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    n = sum(counts.values())
    assert counts.get("train", 0) / n > 0.8
    assert set(counts) <= {"train", "val", "test"}


def test_bm25_prefers_term_dense_docs(spark, docs):
    res = bm25_topk(docs, [(1, "spark window")], k=5).collect()
    assert len(res) == 5
    assert [r["rank"] for r in res] == [1, 2, 3, 4, 5]
    top = res[0]
    txt = docs.where(F.col("doc_id") == top["doc_id"]).collect()[0]["text"].lower()
    assert "spark" in txt or "window" in txt
    # scores non-increasing
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_postings_tf_sums_to_doc_len(spark, docs):
    p = postings(docs)
    chk = p.groupBy("doc_id").agg(
        F.sum("tf").alias("sum_tf"), F.max("dl").alias("dl")
    )
    assert chk.where(F.col("sum_tf") != F.col("dl")).count() == 0


def test_tfidf_weights_positive(spark, docs):
    t = tfidf_vectors(docs)
    assert t.where(F.col("tfidf") < 0).count() == 0


def test_kmeans_partition_invariant_and_matches_numpy(spark):
    emb = table(spark, SF, "embeddings")
    a = kmeans_assign(emb, k=8, n_iter=3).collect()
    b = kmeans_assign(emb.repartition(17), k=8, n_iter=3).collect()
    am = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in a}
    bm = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in b}
    assert am == bm
    # every cluster id in range, distances nonneg
    assert all(0 <= c < 8 and d >= 0 for c, d in am.values())
    # independent numpy replica (same math as tools/gen_goldens.py)
    import hashlib

    pdf = emb.select("vec_id", "embedding").toPandas()
    vids = pdf["vec_id"].to_numpy()
    q = np.stack(
        [
            np.floor(np.asarray(v, dtype=np.float64) * 1e6 + 0.5)
            for v in pdf["embedding"]
        ]
    ).astype(np.int64)
    order = np.argsort(
        np.array([hashlib.md5(str(v).encode()).hexdigest() for v in vids])
    )
    c = q[order[:8]].astype(np.float64) / 1e6
    for _ in range(3):
        x = q / 1e6
        cl = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        nc = c.copy()
        for j in range(8):
            sel = q[cl == j]
            if len(sel):
                nc[j] = sel.sum(axis=0, dtype=np.int64) / (len(sel) * 1e6)
        c = nc
    x = q / 1e6
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1)
    expected = {
        int(v): int(j) for v, j in zip(vids, cl)
    }
    got = {int(v): int(cj) for v, (cj, _) in am.items()}
    assert got == expected


def test_deterministic_shuffle_stable_and_salt_sensitive(spark, docs):
    from spookystuff_spark.operators.packing import deterministic_shuffle

    a = [r["doc_id"] for r in deterministic_shuffle(docs, "doc_id").select("doc_id").collect()]
    b = [
        r["doc_id"]
        for r in deterministic_shuffle(docs.repartition(13), "doc_id")
        .select("doc_id")
        .collect()
    ]
    assert a == b  # partition-layout independent total order
    assert sorted(a) != a  # actually shuffled, not id-ordered
    c = [
        r["doc_id"]
        for r in deterministic_shuffle(docs, "doc_id", salt="epoch-2")
        .select("doc_id")
        .collect()
    ]
    assert a != c and sorted(c) == sorted(a)  # new epoch, same membership


def test_kmeans_fewer_rows_than_k(spark):
    """k > row count degrades to the seeded centroid count instead of an
    IndexError in the update step (ADVICE r3)."""
    from spookystuff_spark.operators.kmeans import kmeans_assign

    rows = [(i, [float(i), float(-i)]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(emb, k=16, n_iter=2).collect()
    assert len(out) == 3
    assert {r["cluster"] for r in out} <= {0, 1, 2}
