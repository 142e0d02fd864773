"""End-to-end corpus pipeline (bench showcase): the full pretraining ingest
chain composed from the individual operators, in dependency order —

  C4 line cleaning → Gopher quality gate → language filter → exact dedup →
  near-dup drop (MinHash + keep-best) → deterministic mixture downsample →
  chunking

Every stage is individually oracled elsewhere (q_doc_profile, q_dedup_exact,
q_dedup_minhash / q_dedup_keep_best in q_curation_suite, q_mixture_sample,
q_doc_chunks); this query demonstrates and *times* their composition as one
lazy Catalyst plan + two bounded wide stages (dedup shuffle, minhash
band-bucket groupBy). Registered ``bench_only`` — the per-stage gates are the
correctness story, this is the throughput story.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import bench_only
from spookystuff_spark.tables import table


@bench_only("q_corpus_pipeline")
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spookystuff_spark.operators.curation import keep_best, mixture_sample
    from spookystuff_spark.operators.dedup import minhash_near_duplicates
    from spookystuff_spark.operators.graph import connected_components
    from spookystuff_spark.operators.text import (
        c4_clean_lines,
        chunk_expr,
        lang_id,
        quality_score,
        token_count,
    )

    docs = table(spark, sf_dir, "documents")

    # 1-3: clean + quality + language — one codegen stage, no shuffle.
    # C4 line cleaning runs where it leaves content; the synthetic corpus has
    # no sentence-terminal punctuation, so a strict C4 page gate would
    # (correctly) drop everything — the C4/Gopher page gates are exercised
    # and oracled on their own in q_doc_profile, this stage keeps the chain
    # non-trivial on the driver corpus.
    cleaned = docs.select(
        "doc_id",
        "lang",
        F.coalesce(
            F.nullif(c4_clean_lines(F.col("text")), F.lit("")), F.col("text")
        ).alias("text"),
    ).filter(
        (F.length("text") >= 40)
        & (quality_score(F.col("text")) >= 0.5)
        & lang_id(F.col("text")).isin("en", "und")
    )

    # 4: exact dedup — keep the smallest doc_id per md5 (one shuffle)
    exact = (
        cleaned.groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.first("text").alias("text"),
            F.first("lang").alias("lang"),
        )
        .drop("fp")
    )
    # `exact` feeds three downstream jobs (minhash sigs, the members join,
    # the survivor anti-join) — materialize it once instead of re-running the
    # scan→clean→dedup chain per job
    exact = exact.localCheckpoint(eager=False)

    # 5: near-dup drop — minhash pairs → components → keep best quality
    pairs = minhash_near_duplicates(
        exact, "doc_id", "text", threshold=0.5, n_hashes=128, bands=16
    )
    comps = connected_components(pairs, "id_a", "id_b")
    members = comps.join(
        exact.select("doc_id", quality_score(F.col("text")).alias("q")),
        comps["node"] == F.col("doc_id"),
    )
    losers = members.join(
        keep_best(members, "component", "doc_id", "q").select(
            F.col("kept_id").alias("doc_id")
        ),
        "doc_id",
        "left_anti",
    ).select("doc_id")
    survivors = exact.join(losers, "doc_id", "left_anti")

    # 6: deterministic mixture downsample (stateless filter)
    sampled = mixture_sample(survivors, "doc_id", "lang", {
        "en": 0.9, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.5,
    })

    # 7: chunk — 1→N explode, pure Catalyst
    return sampled.select(
        "doc_id",
        F.posexplode(chunk_expr(F.col("text"), 64, 48)).alias("chunk_idx", "chunk"),
    ).select(
        "doc_id",
        "chunk_idx",
        token_count(F.col("chunk")).alias("chunk_tokens"),
    )
