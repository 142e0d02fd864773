"""Bloom-filter incremental dedup: exact-output ground truth (per the
self-join/pair-operator discipline — independent pure-python set computation,
exact equality), no-false-negative invariant, and FP-rate sanity."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bloom_new_rows_exact_ground_truth(spark):
    from spookystuff_spark.operators.bloom import bloom_new_rows

    corpus_texts = [f"corpus doc {i}" for i in range(300)]
    # batch: 40 dups of corpus docs + 60 genuinely new, interleaved
    batch_rows = []
    for i in range(100):
        if i % 5 < 2:
            txt = f"corpus doc {i * 7 % 300}"  # duplicate of corpus
        else:
            txt = f"new doc {i}"
        batch_rows.append({"bid": i, "text": txt})
    corpus = spark.createDataFrame(
        [{"cid": i, "text": t} for i, t in enumerate(corpus_texts)]
    ).repartition(7)
    batch = spark.createDataFrame(batch_rows).repartition(3)

    got = {
        r.bid
        for r in bloom_new_rows(
            corpus, batch, F.col("text"), expected_items=300, fpp=0.01
        ).collect()
    }
    corpus_set = set(corpus_texts)
    expect = {r["bid"] for r in batch_rows if r["text"] not in corpus_set}
    assert got == expect  # exact — bloom FPs must all be filtered by verify
    assert len(expect) == 60


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from spookystuff_spark.operators.bloom import (
        build_bloom,
        might_contain,
    )

    member = spark.range(0, 2000).select(F.xxhash64("id").alias("fp"))
    bitset, m, k = build_bloom(member, "fp", expected_items=2000, fpp=0.01)

    # every inserted fingerprint must probe positive (no false negatives)
    hits = member.withColumn(
        "hit", might_contain(spark, bitset, m, k, F.col("fp"))
    )
    assert hits.filter(~F.col("hit")).count() == 0

    # disjoint fingerprints: FP rate near the configured 1%
    other = spark.range(100000, 110000).select(F.xxhash64("id").alias("fp"))
    fps = (
        other.withColumn("hit", might_contain(spark, bitset, m, k, F.col("fp")))
        .filter(F.col("hit"))
        .count()
    )
    assert fps / 10000 < 0.05, f"FP rate {fps / 10000} far above configured 1%"


def test_bloom_empty_corpus_passes_all(spark):
    from spookystuff_spark.operators.bloom import bloom_new_rows

    corpus = spark.createDataFrame([], "cid long, text string")
    batch = spark.createDataFrame([{"bid": 1, "text": "a"}, {"bid": 2, "text": "b"}])
    got = {
        r.bid
        for r in bloom_new_rows(
            corpus, batch, F.col("text"), expected_items=1
        ).collect()
    }
    assert got == {1, 2}
