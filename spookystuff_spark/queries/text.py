"""Text-analysis queries over the documents table — the LLM-training-pipeline
surface (exact dedup, quality stats, language distribution).

All hot-path expressions are native Catalyst functions (md5, regexp_count,
length) — no Python in the per-row path, so the same code whole-stage-codegens
over 100 TB of text. Near-dup (MinHash/SimHash) lives in
``spookystuff_spark/operators/dedup.py`` and registers its queries in
``queries/engine.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.queries import query
from spookystuff_spark.tables import table

PUNCT_CLASS = "[.,;:!?]"


@query(
    "q_doc_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS len_chars,
           CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
           round(1e-6 + CAST(length(regexp_extract_all(text, '{PUNCT_CLASS}')) AS DOUBLE)
                 / greatest(length(text), 1), 4) AS punct_ratio
    FROM documents
    """,
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: char length, whitespace token count,
    punctuation ratio — all JVM-side regexp_count/length."""
    docs = table(spark, sf_dir, "documents")
    length = F.length("text")
    return docs.select(
        "doc_id",
        length.cast("long").alias("len_chars"),
        F.regexp_count(F.col("text"), F.lit(r"\S+")).cast("long").alias("n_tokens"),
        round_stable(
            F.regexp_count(F.col("text"), F.lit(PUNCT_CLASS)).cast("double")
            / F.greatest(length, F.lit(1)),
            4,
        ).alias("punct_ratio"),
    )


@query(
    "q_lang_distribution",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           round(1e-6 + avg(n_chars), 2) AS avg_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        round_stable(F.avg("n_chars"), 2).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           count(*) AS n_copies,
           min(doc_id) AS keep_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup = hash-groupBy. At 100 TB: hash first (16-byte key instead of
    full text in the shuffle), map-side combine collapses within-partition
    duplicates before the exchange."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
        )
    )


@query(
    "q_doc_ngram_profile",
    oracle="""
    SELECT lang,
           CAST(sum(length(regexp_extract_all(text, '[a-z]{3}'))) AS BIGINT)
             AS n_trigrams,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def q_doc_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-overlapping ascii trigram counts per language — a cheap, fully
    codegen'd n-gram profile signal."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(F.regexp_count(F.col("text"), F.lit("[a-z]{3}")))
        .cast("long")
        .alias("n_trigrams"),
        F.count(F.lit(1)).alias("n_docs"),
    )
