"""Similarity search over the embeddings table (array<float> column).

Baseline: brute-force cosine top-k — broadcast the query set, score every
(query, candidate) pair with JVM-side higher-order functions (zip_with +
aggregate: no Python, no UDF), rank per query. At 100 TB the same plan holds
because the candidate scan is embarrassingly parallel and the query side is
broadcast; the scale path (LSH bucketing to prune candidates) lives in
``spookystuff_spark/operators/similarity.py``.

Determinism: cosine is computed with the SAME explicit formula
(sequential dot products, then divide) on both engines, rounded to 4 decimals
before ranking, ties broken on vec_id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.queries import bench_only, query
from spookystuff_spark.tables import table

N_QUERIES = 10
TOP_K = 5


def dot(a: Column, b: Column) -> Column:
    """Sequential dot product via SQL higher-order functions (codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a)) / F.sqrt(dot(b, b))


@query(
    "q_knn_cosine_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.qid, e.vec_id,
             round(1e-6 + list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
                   / sqrt(list_dot_product(q.qv, q.qv))
                   / sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           CAST(e.embedding AS DOUBLE[]))), 4)
               AS cos_sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.qid
    )
    SELECT qid, vec_id, cos_sim FROM (
      SELECT qid, vec_id, cos_sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
)
def q_knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("ev").alias("qv"))
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            round_stable(cosine(F.col("qv"), F.col("ev")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cos_sim")
    )


# gate row lives in q_curation_suite's melt (the gate caps at 50 queries);
# kept in bench for individual timing
ORACLE_EMB_NORMS = """
    SELECT label,
           count(*) AS n_vecs,
           round(1e-6 + avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])))), 4)
             AS avg_norm
    FROM embeddings
    GROUP BY label
    """


@bench_only("q_embedding_norms")
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column aggregate — checks array math parity end to end."""
    emb = table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("ev")
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        round_stable(F.avg(F.sqrt(dot(F.col("ev"), F.col("ev")))), 4).alias("avg_norm"),
    )


def pq_queries(spark: SparkSession, sf_dir: str):
    """Deterministic PQ benchmark queries: the three lowest-vec_id embeddings."""
    emb = table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(3).collect()
    return emb, [(int(r["vec_id"]), list(r["embedding"])) for r in rows]


@bench_only("q_pq_topk")
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5 (operators/pq.py): 32x-compressed codes
    scanned with per-subspace table lookups; codebooks from a bounded
    deterministic sample. Gate-pinned (with exact code assignments) via
    q_curation_suite's golden melt."""
    from spookystuff_spark.operators.pq import pq_topk, train_codebooks

    emb, queries = pq_queries(spark, sf_dir)
    books = train_codebooks(emb, m=8, k=16)
    return pq_topk(emb, queries, books, k=5)


@bench_only("q_ivfpq_topk")
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + residual-PQ composite ANN (operators/pq.py::ivfpq_topk): probe
    4 of 16 cells, ADC-scan 8-byte residual codes. Exact-replica equality and
    partition invariance pinned in tests/test_pq.py."""
    from spookystuff_spark.operators.pq import ivfpq_topk

    emb, queries = pq_queries(spark, sf_dir)
    return ivfpq_topk(emb, queries, n_cells=16, nprobe=4, k=5)
