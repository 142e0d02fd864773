"""Remaining dedup modalities from the task checklist: exact n-gram Jaccard
(SQL-oracled — array_intersect parity with DuckDB list functions) and
embedding-cosine near-dup (rows-only, LSH-bucketed)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import bench_only, golden_oracle, query
from spookystuff_spark.tables import table

PAIR_CAP = 120  # doc_id bound for the O(n²) oracle-checkable pair set


@query(
    "q_ngram_jaccard_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS grams
      FROM documents WHERE doc_id < {PAIR_CAP}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(1e-6 + CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / greatest(len(list_distinct(a.grams || b.grams)), 1), 4)
             AS jaccard_tokens
    FROM toks a JOIN toks b
      ON a.source = b.source AND a.doc_id < b.doc_id
    """,
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard for same-source pairs (bounded id range keeps
    the O(n²) pair set oracle-checkable; the unbounded scale path is the
    MinHash pipeline, which replaces the cross join with band buckets)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < PAIR_CAP)
    toks = docs.select(
        "doc_id",
        "source",
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z0-9]+)"), 1)
        ).alias("grams"),
    )
    a = toks.select(
        F.col("doc_id").alias("id_a"),
        F.col("source").alias("src_a"),
        F.col("grams").alias("grams_a"),
    )
    b = toks.select(
        F.col("doc_id").alias("id_b"),
        F.col("source").alias("src_b"),
        F.col("grams").alias("grams_b"),
    )
    inter = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
    union = F.size(F.array_union(F.col("grams_a"), F.col("grams_b")))
    return (
        a.join(
            b,
            (F.col("src_a") == F.col("src_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                inter.cast("double") / F.greatest(union, F.lit(1)) + F.lit(1e-6), 4
            ).alias("jaccard_tokens"),
        )
    )


@query("q_neardup_embedding", oracle=golden_oracle("q_neardup_embedding"))
def q_neardup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within LSH buckets — the semantic-dedup
    modality; deterministic via seed-fixed hyperplanes. Production threshold
    would be ~0.95; the driver's synthetic embeddings max out at cos≈0.51, so
    the demo threshold is 0.4 to exercise the full pipeline non-trivially."""
    from spookystuff_spark.operators.similarity import lsh_topk_pairs

    emb = table(spark, sf_dir, "embeddings")
    pairs = lsh_topk_pairs(emb, "vec_id", "embedding", dim=64, k=10, n_planes=6)
    return (
        pairs.filter((F.col("cos_sim") >= 0.4) & (F.col("qid") < F.col("vec_id")))
        .select(
            F.col("qid").alias("id_a"),
            F.col("vec_id").alias("id_b"),
            "cos_sim",
        )
    )


@query("q_dedup_clusters", oracle=golden_oracle("q_dedup_clusters"))
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup pipeline: MinHash pairs → connected components → cluster
    sizes with canonical (min-id) representative — what a 100 TB dedup job
    actually emits."""
    from spookystuff_spark.operators.dedup import minhash_near_duplicates
    from spookystuff_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.5, n_hashes=128, bands=16
    )
    comps = connected_components(pairs, "id_a", "id_b")
    return comps.groupBy(F.col("component").alias("keep_id")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )


@bench_only("q_dedup_clusters_star")
def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline on the O(log n)-round large-star/small-star CC
    (operators/graph.py::connected_components_star) — the scale path when
    duplicate chains are long; equality with min-label CC pinned in
    tests/test_cc_star.py."""
    from spookystuff_spark.operators.dedup import minhash_near_duplicates
    from spookystuff_spark.operators.graph import connected_components_star

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.5, n_hashes=128, bands=16
    )
    comps = connected_components_star(pairs, "id_a", "id_b")
    return comps.groupBy(F.col("component").alias("keep_id")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )


@bench_only("q_bloom_dedup_new")
def q_bloom_dedup_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: which docs of the 'new batch' (every 7th
    doc) are genuinely absent from the accumulated corpus (the rest)?
    The Bloom filter routes definitely-new rows past the verify join; the
    result is EXACT (batch WHERE text NOT IN corpus), so the gate pins it
    via SQL in q_curation_suite's melt."""
    from spookystuff_spark.operators.bloom import bloom_new_rows

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    return (
        bloom_new_rows(corpus, batch, F.col("text"), fpp=0.01)
        .select("doc_id")
        .orderBy("doc_id")
    )
