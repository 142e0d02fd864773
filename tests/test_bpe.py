"""BPE trainer/encoder invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from spookystuff_spark.operators.bpe import (
    encode_word,
    fit_encode,
    train_bpe,
    word_freqs,
)
from spookystuff_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_train_bpe_learns_frequent_pairs():
    merges = train_bpe([("aaab", 10), ("aab", 5)], n_merges=3)
    assert merges[0] == ("a", "a")  # most frequent adjacent pair first
    ranks = {m: i for i, m in enumerate(merges)}
    toks = encode_word("aaab", ranks)
    assert "".join(toks) == "aaab</w>"
    assert len(toks) < len("aaab") + 1  # merging actually compressed


def test_encode_word_unknown_chars_fall_through():
    toks = encode_word("zzq", {})
    assert toks == ["z", "z", "q", "</w>"]


def test_fit_encode_counts_bounded(spark):
    docs = table(spark, SF, "documents")
    merges, counts = fit_encode(docs, n_merges=32)
    assert len(merges) == 32
    joined = counts.join(
        docs.select(
            "doc_id", F.length(F.lower("text")).alias("n_chars")
        ),
        "doc_id",
    )
    bad = joined.where(
        (F.col("n_bpe_tokens") < F.col("n_words"))  # ≥1 token per word
        | (F.col("n_bpe_tokens") > F.col("n_chars") + F.col("n_words"))
    )
    assert bad.count() == 0


def test_word_freqs_deterministic_under_repartition(spark):
    docs = table(spark, SF, "documents")
    a = [(r["word"], r["freq"]) for r in word_freqs(docs, top_words=50).collect()]
    b = [
        (r["word"], r["freq"])
        for r in word_freqs(docs.repartition(11), top_words=50).collect()
    ]
    assert a == b
