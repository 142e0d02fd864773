"""Model-assisted pipeline queries: heavy-hitter vocabulary mining, a trained
quality/language classifier, and near-dup-aware split repair — individually
benchmarked (``bench_only``), gate-pinned through the melted suites
(q_text_suite / q_curation_suite; the driver's correctness gate caps the
per-round query list at 50).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import bench_only
from spookystuff_spark.tables import table

HH_K = 30
# near-uniform synthetic bigram distribution: the MG survivor guarantee needs
# n_counters ≳ total/kth-count ≈ 650 (ratio is SF-invariant); 2048 gives 3x
# margin and heavy_hitters raises loudly if the corpus ever outgrows it
HH_COUNTERS = 2048
CLF_FEATURES = 512
CLF_ITERS = 5
CLF_RIDGE = 1.0


@bench_only("q_heavy_hitters_bigrams")
def q_heavy_hitters_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-30 token bigrams by the Misra-Gries sketch-then-verify plan
    (operators/heavy.py): bounded-memory candidate pass, exact recount of
    candidates only — the groupBy never sees the full bigram universe.
    Output equals the exact SQL top-k (coverage guarantee asserted in
    tests); gate-pinned via q_text_suite's melt."""
    from spookystuff_spark.operators.heavy import heavy_hitters

    docs = table(spark, sf_dir, "documents")
    return heavy_hitters(docs, "text", k=HH_K, n_counters=HH_COUNTERS, ngram=2)


# DuckDB mirror of the exact bigram top-k (the sketch plan's output contract)
ORACLE_HEAVY_HITTERS = f"""
    SELECT tok, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank FROM (
      SELECT tok, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, tok) AS rank
      FROM (
        SELECT array_to_string(t[i:i+1], ' ') AS tok
        FROM (SELECT regexp_extract_all(lower(text), '\\S+') AS t
              FROM documents),
             UNNEST(range(1, len(t))) AS r(i)
        WHERE len(t) >= 2)
      GROUP BY tok)
    WHERE rank <= {HH_K}
    """


@bench_only("q_text_classifier")
def q_text_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a hashed-BoW logistic-regression document classifier with
    bit-reproducible distributed ridge-IRLS (operators/classifier.py), score
    every doc. The weak-supervision label is presence of the corpus's rare
    marker token 'dup' (~0.1% token frequency) — the one text-derived signal
    the synthetic corpus makes learnable, so the trained model demonstrably
    SEPARATES (separation pinned in tests, exact probabilities pinned via
    q_text_suite's golden melt). Output: per-doc probability (4 dp) +
    prediction."""
    from spookystuff_spark.operators.classifier import fit_score_text_classifier

    docs = table(spark, sf_dir, "documents")
    label = F.array_contains(
        F.split(F.lower(F.col("text")), r"\s+"), "dup"
    )
    _, scores = fit_score_text_classifier(
        docs,
        "doc_id",
        "text",
        label,
        n_features=CLF_FEATURES,
        n_iters=CLF_ITERS,
        ridge=CLF_RIDGE,
    )
    return scores.select(
        F.col("id").alias("doc_id"), "prob", "pred"
    ).orderBy("doc_id")


@bench_only("q_leakage_split")
def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test assignment: minhash pairs → components →
    every cluster member inherits its canonical's split (no near-dup pair may
    straddle train/test — evaluation leakage). Output: the clustered docs
    with original and final split; gate-pinned via q_curation_suite's golden
    melt (pairs come from the seed-fixed minhash stack)."""
    from spookystuff_spark.operators.curation import leakage_safe_split
    from spookystuff_spark.operators.dedup import minhash_near_duplicates

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.5, n_hashes=128, bands=16
    )
    out = leakage_safe_split(docs, pairs, "doc_id")
    return (
        out.filter(F.col("clustered"))
        .select("doc_id", "orig_split", "split", F.col("moved").cast("long").alias("moved"))
        .orderBy("doc_id")
    )


@bench_only("q_textrank_keywords")
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus keywords by TextRank (operators/textrank.py): PageRank over the
    token co-occurrence graph, state bounded by the vocabulary, each
    iteration bit-reproducible via floor-quantized exact contribution sums.
    Gate-pinned via the q_text_suite golden melt (independent pure-Python
    PageRank replica in tools/gen_goldens.py)."""
    from spookystuff_spark.operators.textrank import textrank

    docs = table(spark, sf_dir, "documents")
    return textrank(docs, "text", n_iter=10, damping=0.85, top_k=20)
