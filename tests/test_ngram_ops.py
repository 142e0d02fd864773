"""operators/ngram.py unit tests pinned to independent pure-python ground
truth (the repo rule for anything that joins a corpus against itself — see
tests/test_ground_truth_audit.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from spookystuff_spark.operators.ngram import (
    char_ngram_logprob,
    decontaminate,
    duplicated_spans,
    token_ngrams,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "THE QUICK brown fox jumps over the lazy dog"),  # case-dup of 1
    (3, "a completely different document about spark engines"),
    (4, "short"),
    (5, "the quick brown fox sleeps under the lazy dog"),  # shares prefix 4-gram
]


def _py_grams(text: str, n: int) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_token_ngrams_matches_python(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: set(r["g"])
        for r in df.select(
            "doc_id", token_ngrams(F.col("text"), 3).alias("g")
        ).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_grams(text, 3), doc_id


def test_token_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(4, "short"), (6, "")], ["doc_id", "text"])
    rows = df.select(token_ngrams(F.col("text"), 3).alias("g")).collect()
    assert all(r["g"] == [] for r in rows)


def test_decontaminate_ground_truth(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    benchmark = df.filter(F.col("doc_id") == 1)
    corpus = df.filter(F.col("doc_id") != 1)
    got = {
        r["doc_id"]: r["contaminated_grams"]
        for r in decontaminate(corpus, benchmark, "doc_id", "text", n=4).collect()
    }
    bench_grams = _py_grams(DOCS[0][1], 4)
    expected = {}
    for doc_id, text in DOCS[1:]:
        hits = len(_py_grams(text, 4) & bench_grams)
        if hits:
            expected[doc_id] = hits
    assert got == expected
    assert 2 in got and 5 in got and 3 not in got


def test_duplicated_spans_ground_truth(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dup_grams"], r["total_grams"])
        for r in duplicated_spans(df, "doc_id", "text", n=4).collect()
    }
    all_grams = {d: _py_grams(t, 4) for d, t in DOCS}
    expected = {}
    for d, grams in all_grams.items():
        dup = {
            g for g in grams if any(g in o for od, o in all_grams.items() if od != d)
        }
        if dup:
            expected[d] = (len(dup), len(grams))
    assert got == expected


def test_char_ngram_logprob_ground_truth(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["avg_logprob"], r["n_grams"])
        for r in char_ngram_logprob(df, "doc_id", "text", n=3).collect()
    }
    # independent python LM
    from collections import Counter

    grams_per_doc = {
        d: [t.lower()[i : i + 3] for i in range(len(t) - 2)] for d, t in DOCS
    }
    model = Counter(g for gs in grams_per_doc.values() for g in gs)
    total = sum(model.values())
    for d, gs in grams_per_doc.items():
        if not gs:
            assert d not in got
            continue
        exp = sum(math.log10(model[g] / total) for g in gs) / len(gs)
        assert got[d][1] == len(gs)
        assert abs(got[d][0] - exp) < 1e-9, d


def test_ngram_ops_are_catalyst_native(spark):
    """The gram expansion and count path must stay JVM-side — no Python
    stages anywhere in the hygiene plans."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = (
        duplicated_spans(df, "doc_id", "text", n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "MapInPandas", "ArrowEvalPython"):
        assert marker not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = (
        decontaminate(df, df.limit(2), "doc_id", "text", n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_longest_dup_span_crafted(spark):
    """Run-length semantics: two docs sharing an 8-token span, measured with
    n=3 anchors — span of 8 tokens = run of 6 consecutive dup anchors."""
    from spookystuff_spark.operators.ngram import longest_dup_span

    shared = "a b c d e f g h"  # 8 tokens
    rows = [
        (1, f"x1 y1 {shared} z1"),
        (2, f"p q r {shared}"),
        (3, "totally unique words only here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["longest_span_tokens"]
        for r in longest_dup_span(df, "doc_id", "text", n=3).collect()
    }
    assert out[1] == 8 and out[2] == 8
    assert 3 not in out  # no duplicated anchor at all


def test_longest_dup_span_within_doc_repetition(spark):
    from spookystuff_spark.operators.ngram import longest_dup_span

    # the same 5-token phrase repeated inside ONE doc is also a dup span
    df = spark.createDataFrame(
        [(7, "u v w x y junk1 junk2 junk3 u v w x y")], ["doc_id", "text"]
    )
    out = longest_dup_span(df, "doc_id", "text", n=5).collect()
    assert out[0]["longest_span_tokens"] == 5
