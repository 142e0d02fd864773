"""Full-text retrieval over the corpus: TF-IDF / Okapi BM25 top-k.

Rebuild-native (the reference fetches documents but has no ranking surface).
Design is the classic two-table decomposition a 100 TB corpus needs:

* postings  (doc_id, term, tf)      — one narrow scan + one groupBy shuffle
* docstats  (doc_id, dl)            — derived in the same scan
* corpus stats (N, avgdl, df(term)) — partial-aggregated map-side

Queries are tiny (user-supplied strings) → broadcast-joined against the
postings; scoring is pure Catalyst arithmetic; top-k is a bounded
window-rank per query. No Python anywhere, no cartesian product, and the
postings table can be bucketed by term for repeated query workloads
(sources/bucketed.py).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from spookystuff_spark.functions.rounding import round_stable

# Word tokenizer shared with the n-gram ops: lowercase alnum runs — identical
# semantics in Spark and DuckDB regexp_extract_all.
WORD_RE = "([a-z0-9]+)"
WORD_RE_SQL = "[a-z0-9]+"

K1 = 1.2
B = 0.75


def terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term) pairs — one row per token occurrence."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 1)
        ).alias("term"),
    )


def postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) + per-doc length dl. One shuffle (the groupBy)."""
    t = terms(docs, id_col, text_col)
    tf = t.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf.join(dl, "doc_id")


def bm25_topk(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k per query.

    ``queries``: (query_id, query_text) literals. Output
    (query_id, rank, doc_id, score) with score rounded for cross-engine
    stability; ties broken by doc_id so the cut is total-ordered.

    Scale shape: the query-term filter is pushed to the RAW token stream
    (a broadcast semi-join before any grouping), so the only term-level
    shuffle is over postings that actually match a query term — the full
    inverted index is never materialized, and per-term document
    frequencies are computed (and broadcast) for the handful of query
    terms only, never for the whole vocabulary. Corpus-wide stats
    (N, avgdl) come from the doc-level length frame; the one
    doc-cardinality join (lengths onto matching postings) is left to
    AQE — broadcast when small, shuffle otherwise.
    """
    spark = docs.sparkSession
    t = terms(docs, id_col, text_col)

    dl = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )

    qterms = (
        spark.createDataFrame(list(queries), "query_id int, qtext string")
        .select(
            "query_id",
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(F.lower("qtext"), F.lit(WORD_RE), 1)
                )
            ).alias("term"),
        )
    )

    tf_q = (
        t.join(F.broadcast(qterms.select("term").distinct()), "term", "leftsemi")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_term = tf_q.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf_q.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_term), "term")
        .crossJoin(F.broadcast(stats))
        .join(dl, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(round_stable(F.sum(idf * tf_part), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_topk_sql(docs_sql: str, queries: Sequence[tuple[int, str]], k: int = 10) -> str:
    """DuckDB twin of :func:`bm25_topk` (oracle)."""
    qvals = ", ".join(f"({qid}, '{txt}')" for qid, txt in queries)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE_SQL}')) AS term
  FROM ({docs_sql})
), post AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), stats AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs,
         CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id) AS avgdl
  FROM tok
), df_term AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM post GROUP BY term
), q(query_id, qtext) AS (VALUES {qvals}),
qterms AS (
  SELECT DISTINCT query_id,
         unnest(regexp_extract_all(lower(qtext), '{WORD_RE_SQL}')) AS term
  FROM q
), scored AS (
  SELECT qt.query_id, p.doc_id,
         round(SUM(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (p.tf * ({K1} + 1))
             / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
         ) + 1e-6, 4) AS score
  FROM post p
  JOIN qterms qt USING (term)
  JOIN df_term d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY qt.query_id, p.doc_id
), ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}"""


def tfidf_vectors(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tfidf_weight) — ln-scaled tf × smoothed idf; the sparse
    representation downstream cosine/classifier stages consume."""
    post = postings(docs, id_col, text_col)
    n_docs = post.groupBy().agg(F.countDistinct("doc_id").alias("n_docs"))
    df_term = post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    weight = (F.lit(1.0) + F.log("tf")) * F.log(
        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
    )
    return (
        post.join(F.broadcast(df_term), "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", round_stable(weight, 6).alias("tfidf"))
    )
