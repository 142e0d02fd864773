"""Heavy-hitter mining, trained text classifier, and leakage-safe split:
exactness vs driver-side references, partition-layout invariance, and the
loud-degradation contracts."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE

from spookystuff_spark.tables import table


# ----------------------------------------------------------- heavy hitters


def test_heavy_hitters_exact_and_layout_invariant(spark):
    from spookystuff_spark.operators.heavy import (
        heavy_hitters,
        misra_gries_exact_reference,
    )

    docs = table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = misra_gries_exact_reference(texts, k=10, ngram=2)

    got = [
        (r["tok"], r["n"], r["rank"])
        for r in heavy_hitters(docs, "text", k=10, n_counters=2048, ngram=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == expected

    # candidate sets differ per partitioning; the exact recount must not
    got7 = [
        (r["tok"], r["n"], r["rank"])
        for r in heavy_hitters(
            docs.repartition(7), "text", k=10, n_counters=2048, ngram=2
        )
        .orderBy("rank")
        .collect()
    ]
    assert got7 == expected


def test_heavy_hitters_unigram(spark):
    from spookystuff_spark.operators.heavy import (
        heavy_hitters,
        misra_gries_exact_reference,
    )

    docs = table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = misra_gries_exact_reference(texts, k=5, ngram=1)
    got = [
        (r["tok"], r["n"], r["rank"])
        for r in heavy_hitters(docs, "text", k=5, n_counters=256)
        .orderBy("rank")
        .collect()
    ]
    assert got == expected


def test_heavy_hitters_coverage_check_raises(spark):
    from spookystuff_spark.operators.heavy import heavy_hitters

    docs = table(spark, SF_SMOKE, "documents")
    # near-uniform bigrams with a tiny sketch: guarantee must fail LOUDLY
    with pytest.raises(ValueError, match="coverage guarantee"):
        heavy_hitters(docs, "text", k=30, n_counters=64, ngram=2)


# -------------------------------------------------------------- classifier


@pytest.fixture(scope="module")
def clf_result(spark):
    from spookystuff_spark.operators.classifier import fit_score_text_classifier

    docs = table(spark, SF_SMOKE, "documents")
    label = F.array_contains(F.split(F.lower(F.col("text")), r"\s+"), "dup")
    w, scores = fit_score_text_classifier(
        docs, "doc_id", "text", label, n_features=512, n_iters=5, ridge=1.0
    )
    return w, scores.collect(), docs


def test_classifier_separates(clf_result):
    _, rows, docs = clf_result
    positives = {
        r["doc_id"]
        for r in docs.select("doc_id", "text").collect()
        if "dup" in r["text"].lower().split()
    }
    pos = [r["prob"] for r in rows if r["id"] in positives]
    neg = [r["prob"] for r in rows if r["id"] not in positives]
    assert pos and neg
    # trained model must actually separate the classes, not learn a base rate
    assert min(pos) > 0.5 > max(neg)
    preds = {r["id"]: r["pred"] for r in rows}
    acc = sum(
        1 for i, p in preds.items() if p == (1 if i in positives else 0)
    ) / len(preds)
    assert acc == 1.0


def test_classifier_layout_invariant(spark, clf_result):
    from spookystuff_spark.operators.classifier import fit_score_text_classifier

    _, rows, _ = clf_result
    docs = table(spark, SF_SMOKE, "documents").repartition(7)
    label = F.array_contains(F.split(F.lower(F.col("text")), r"\s+"), "dup")
    w7, scores7 = fit_score_text_classifier(
        docs, "doc_id", "text", label, n_features=512, n_iters=5, ridge=1.0
    )
    # int64-quantized gradient sums: weights and scores identical bit-for-bit
    got = {(r["id"], r["prob"], r["pred"]) for r in scores7.collect()}
    assert got == {(r["id"], r["prob"], r["pred"]) for r in rows}


def test_classifier_matches_numpy_replica(clf_result):
    """Independent replica (same spec, straight numpy) must agree exactly."""
    import hashlib
    import math

    import numpy as np

    w, rows, docs = clf_result
    n_features = 512
    feats, ys, dids = [], [], []
    for r in docs.select("doc_id", "text").orderBy("doc_id").collect():
        toks = r["text"].lower().split()
        idxs = sorted(
            {
                int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_features
                for t in toks
            }
        )
        feats.append(np.array(idxs, dtype=np.int64))
        ys.append(1.0 if "dup" in toks else 0.0)
        dids.append(r["doc_id"])
    quant = 1 << 28
    D = n_features + 1
    wr = np.zeros(D)

    def logit(idxs):
        z = float(np.dot(wr[idxs], np.ones(len(idxs))) + wr[-1])
        return max(-30.0, min(30.0, z))

    for _ in range(5):
        gq = np.zeros(D, dtype=np.int64)
        hq = np.zeros((D, D), dtype=np.int64)
        for idxs, y in zip(feats, ys):
            p = 1.0 / (1.0 + math.exp(-logit(idxs)))
            sj = p * (1.0 - p)
            ix = np.concatenate([idxs, [D - 1]])
            v = np.ones(len(ix))
            gq[ix] += np.rint((p - y) * v * quant).astype(np.int64)
            hq[np.ix_(ix, ix)] += np.rint(sj * np.outer(v, v) * quant).astype(
                np.int64
            )
        g = gq / quant
        H = hq / quant
        delta = np.linalg.solve(H + 1.0 * np.eye(D), -(g + 1.0 * wr))
        wr = wr + delta

    assert np.array_equal(w, wr)
    expect = {}
    for did, idxs in zip(dids, feats):
        p = 1.0 / (1.0 + math.exp(-logit(idxs)))
        expect[did] = (round(p + 1e-9, 4), 1 if p >= 0.5 else 0)
    got = {r["id"]: (r["prob"], r["pred"]) for r in rows}
    assert got == expect


# ------------------------------------------------------- leakage-safe split


def test_leakage_split_no_cross_split_pairs(spark):
    from spookystuff_spark.operators.curation import leakage_safe_split
    from spookystuff_spark.operators.dedup import minhash_near_duplicates

    docs = table(spark, SF_SMOKE, "documents")
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.5, n_hashes=128, bands=16
    )
    out = leakage_safe_split(docs, pairs, "doc_id")
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    leaks = [
        (r["id_a"], r["id_b"])
        for r in pairs.collect()
        if split_of[r["id_a"]] != split_of[r["id_b"]]
    ]
    assert leaks == []
    # every doc keeps an assignment; unclustered docs keep their hash split
    assert len(split_of) == docs.count()
    base = {
        r["doc_id"]: r["orig_split"] for r in out.collect()
    }
    unmoved = [d for d in split_of if split_of[d] == base[d]]
    assert len(unmoved) >= len(split_of) * 0.9  # only cluster members move


# --------------------------------------------------------- dup-span removal


def test_remove_dup_spans_crafted(spark):
    """Crafted corpus: a known 15-token span shared by two docs must be cut
    from both; an all-duplicate doc must empty out; unique docs are absent."""
    import hashlib

    from spookystuff_spark.operators.ngram import remove_dup_spans

    span = " ".join(f"s{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (0, f"alpha beta {span} gamma"),
            (1, f"delta {span} epsilon zeta"),
            (2, span),
            (3, "totally unique words only here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_dup_spans(docs, "doc_id", "text").collect()}
    assert set(out) == {0, 1, 2}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[0]["cleaned_md5"] == md5("alpha beta gamma")
    assert (out[0]["kept_tokens"], out[0]["removed_tokens"]) == (3, 15)
    assert out[1]["cleaned_md5"] == md5("delta epsilon zeta")
    assert out[2]["cleaned_md5"] == md5("")
    assert (out[2]["kept_tokens"], out[2]["removed_tokens"]) == (0, 15)


def test_remove_dup_spans_consistent_with_longest(spark):
    """Affected-doc set == longest_dup_span's flagged set; removal never
    exceeds the doc and always covers >= n tokens per flagged doc."""
    from spookystuff_spark.operators.ngram import longest_dup_span, remove_dup_spans

    docs = table(spark, SF_SMOKE, "documents")
    removed = {r["doc_id"]: r for r in remove_dup_spans(docs, "doc_id", "text").collect()}
    flagged = {r["doc_id"] for r in longest_dup_span(docs, "doc_id", "text").collect()}
    assert set(removed) == flagged
    for r in removed.values():
        assert r["removed_tokens"] >= 15
        assert r["kept_tokens"] >= 0


# -------------------------------------------------- cluster-balanced sample


def test_cluster_balanced_sample_caps_and_invariance(spark):
    from spookystuff_spark.operators.curation import cap_per_stratum
    from spookystuff_spark.operators.kmeans import kmeans_assign

    emb = table(spark, SF_SMOKE, "embeddings")
    cells = kmeans_assign(emb, k=8, n_iter=3)
    out = cap_per_stratum(cells, "vec_id", "cluster", cap=5)
    per = {}
    for r in out.collect():
        per.setdefault(r["cluster"], []).append(r["vec_id"])
    assert per and all(len(v) <= 5 for v in per.values())

    cells7 = kmeans_assign(emb.repartition(7), k=8, n_iter=3)
    out7 = cap_per_stratum(cells7, "vec_id", "cluster", cap=5)
    assert {(r["vec_id"], r["cluster"]) for r in out7.collect()} == {
        (r["vec_id"], r["cluster"]) for r in out.collect()
    }
