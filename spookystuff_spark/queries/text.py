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
from spookystuff_spark.queries import bench_only, query
from spookystuff_spark.tables import table

PUNCT_CLASS = "[.,;:!?]"


_GOPHER_SQL_STOPS = " + ".join(
    f"(CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END)"
    for w in ("the", "be", "to", "of", "and", "that", "have", "with")
)

ORACLE_DOC_PROFILE = f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             length(regexp_extract_all(text, '\\S+')) AS ws_toks,
             length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_toks,
             length(regexp_extract_all(text, '{PUNCT_CLASS}')) AS punct,
             length(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|a|in)\\b')) AS stop_hits,
             length(regexp_replace(text, '\\s+', '', 'g')) AS non_ws,
             len(list_filter(regexp_extract_all(text, '\\S+'),
                             x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
             len(string_split(text, chr(10))) AS n_lines,
             len(list_distinct(string_split(text, chr(10)))) AS uniq_lines,
             length(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS symbols,
             len(list_filter(string_split(text, chr(10)),
                             x -> regexp_matches(x, '^\\s*([•‣▪●\\-\\*])'))) AS bullet_lines,
             len(list_filter(string_split(text, chr(10)),
                             x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$'))) AS ellipsis_lines,
             ({_GOPHER_SQL_STOPS}) AS req_stops
      FROM documents)
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS len_chars,
           CAST(ws_toks AS BIGINT) AS n_tokens,
           CAST(bpe_toks AS BIGINT) AS bpe_tokens,
           round(1e-6 + CAST(punct AS DOUBLE) / greatest(n_chars, 1), 4) AS punct_ratio,
           round(1e-6 + (
             (CASE WHEN n_chars BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(punct AS DOUBLE)/greatest(n_chars,1) <= 0.1 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(stop_hits AS DOUBLE)/greatest(ws_toks,1) >= 0.01 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN CAST(n_chars AS DOUBLE)/greatest(ws_toks,1) BETWEEN 2.5 AND 12 THEN 1.0 ELSE 0.0 END)
           ) / 4, 2) AS quality,
           round(1e-6 + CAST(non_ws AS DOUBLE) / greatest(ws_toks, 1), 4) AS mean_word_len,
           round(1e-6 + CAST(alpha_words AS DOUBLE) / greatest(ws_toks, 1), 4) AS alpha_word_frac,
           round(1e-6 + CAST(n_lines - uniq_lines AS DOUBLE) / greatest(n_lines, 1), 4) AS dup_line_frac,
           CAST(CASE WHEN ws_toks BETWEEN 50 AND 100000
                      AND CAST(non_ws AS DOUBLE)/greatest(ws_toks,1) BETWEEN 3.0 AND 10.0
                      AND CAST(symbols AS DOUBLE)/greatest(ws_toks,1) <= 0.1
                      AND CAST(bullet_lines AS DOUBLE)/greatest(n_lines,1) <= 0.9
                      AND CAST(ellipsis_lines AS DOUBLE)/greatest(n_lines,1) <= 0.3
                      AND CAST(alpha_words AS DOUBLE)/greatest(ws_toks,1) >= 0.8
                      AND req_stops >= 2
                      AND CAST(n_lines - uniq_lines AS DOUBLE)/greatest(n_lines,1) <= 0.3
                THEN 1 ELSE 0 END AS INT) AS gopher_pass
    FROM f
    """


@bench_only("q_doc_profile")
def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-analysis profile in ONE scan: char length, whitespace
    + BPE-ish token counts, punctuation ratio, the composite quality score,
    and the published Gopher pretraining filters (Rae et al. 2021 A1.1:
    word-count band, mean word length, symbol/bullet/ellipsis ratios,
    alphabetic-word fraction, required stopwords, duplicate-line repetition)
    — all JVM-side regexp/array expressions (one codegen stage; the shape a
    100 TB quality-filter pass wants: single pass, no shuffle)."""
    from spookystuff_spark.operators.text import (
        bpe_token_count,
        gopher_pass,
        gopher_stats,
        quality_score,
        token_count,
    )

    docs = table(spark, sf_dir, "documents")
    length = F.length("text")
    g = gopher_stats(F.col("text"))
    return docs.select(
        "doc_id",
        length.cast("long").alias("len_chars"),
        token_count(F.col("text")).alias("n_tokens"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
        round_stable(
            F.regexp_count(F.col("text"), F.lit(PUNCT_CLASS)).cast("double")
            / F.greatest(length, F.lit(1)),
            4,
        ).alias("punct_ratio"),
        quality_score(F.col("text")).alias("quality"),
        round_stable(g["mean_word_len"], 4).alias("mean_word_len"),
        round_stable(g["alpha_word_frac"], 4).alias("alpha_word_frac"),
        round_stable(g["dup_line_frac"], 4).alias("dup_line_frac"),
        gopher_pass(F.col("text")).cast("int").alias("gopher_pass"),
    )


@query(
    "q_doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS blob_sha
    FROM documents
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fingerprints in one scan: normalized-content md5 (the
    formatting-robust dedup key — groupBy it for exact near-dup collapse, see
    q_dedup_exact) plus binary-column plumbing parity (utf-8 blob length +
    sha256, the same path operators/multimodal.py uses for media blobs)."""
    from spookystuff_spark.operators.text import fingerprint

    docs = table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("blob_sha"),
    )


ORACLE_LANG_DIST = """
    SELECT lang, source,
           count(*) AS n_docs,
           round(1e-6 + avg(n_chars), 2) AS avg_chars,
           max(n_chars) AS max_chars,
           CAST(sum(length(regexp_extract_all(text, '[a-z]{3}'))) AS BIGINT)
             AS n_trigrams
    FROM documents
    GROUP BY lang, source
    """


@bench_only("q_lang_distribution")
def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition per (lang, source) incl. a cheap codegen'd n-gram
    profile signal (non-overlapping ascii trigram counts)."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        round_stable(F.avg("n_chars"), 2).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.regexp_count(F.col("text"), F.lit("[a-z]{3}")))
        .cast("long")
        .alias("n_trigrams"),
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


