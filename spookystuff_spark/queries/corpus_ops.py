"""Corpus-structure operators: global line dedup, co-purchase triangle
stats, Z-order clustering keys.

All three are ``bench_only`` (the driver's correctness gate is at its
50-query cap); every value is pinned through the melted suites —
``q_line_dedup`` rides ``q_text_suite``, the other two ride
``q_scalar_suite``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.operators.layout import zorder_key, zorder_sql
from spookystuff_spark.operators.lines import dedup_lines
from spookystuff_spark.operators.triangles import copurchase_edges, triangle_stats
from spookystuff_spark.queries import bench_only
from spookystuff_spark.tables import table

# ---------------------------------------------------------------- line dedup

ORACLE_LINE_DEDUP = """
    WITH lines AS (
      SELECT doc_id, generate_subscripts(parts, 1) - 1 AS line_no,
             unnest(parts) AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS parts
            FROM documents)
    ), keyed AS (
      SELECT doc_id, line_no, line, trim(line) AS key,
             row_number() OVER (
               PARTITION BY trim(line) ORDER BY doc_id, line_no) AS rn
      FROM lines
    ), kept AS (
      SELECT doc_id, line_no, line FROM keyed
      WHERE length(key) < 1 OR rn = 1
    ), rebuilt AS (
      SELECT doc_id,
             string_agg(line, chr(10) ORDER BY line_no) AS text_clean,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           md5(coalesce(r.text_clean, '')) AS clean_md5,
           CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(string_split(d.text, chr(10)))
                - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
"""


@bench_only("q_line_dedup")
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide line dedup (operators/lines.py); the cleaned
    text is pinned by md5 so the gate row stays narrow."""
    docs = table(spark, sf_dir, "documents")
    out = dedup_lines(docs)
    return out.select(
        "doc_id",
        F.md5("text_clean").alias("clean_md5"),
        "n_lines",
        "n_kept",
        "n_dropped",
    )


# ------------------------------------------------------------- triangle stats

ORACLE_TRIANGLES = """
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ), deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b AS node FROM pairs
      ) GROUP BY node
    ), tri AS (
      SELECT count(*) AS n FROM pairs e1
      JOIN pairs e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN pairs e3 ON e3.a = e1.b AND e3.b = e2.b
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS BIGINT)
             AS n_wedges,
           round(1e-6 + 3.0 * (SELECT n FROM tri)
                 / (SELECT sum(d * (d - 1) // 2) FROM deg), 6) AS gcc
"""


@bench_only("q_triangle_stats")
def q_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-ordered triangle count + global clustering coefficient on
    the part co-purchase graph (operators/triangles.py). The oracle's
    naive a<b<c 3-way join counts the same triangles the oriented
    engine does — orientation changes the join shape, not the set."""
    li = table(spark, sf_dir, "lineitem")
    stats = triangle_stats(copurchase_edges(li))
    return stats.withColumn(
        "gcc",
        F.round(
            F.lit(1e-6) + 3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
        ),
    )


# --------------------------------------------------------------- zorder keys

_Z_BITS = 16
_Z_BUCKET_SHIFT = 2 * _Z_BITS - 6  # top 6 bits -> 64 buckets

_Z_SQL = zorder_sql(["l_partkey", "l_suppkey"], _Z_BITS)

ORACLE_ZORDER = f"""
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(z) AS BIGINT) AS min_z,
           CAST(max(z) AS BIGINT) AS max_z
    FROM (SELECT ({_Z_SQL}) >> {_Z_BUCKET_SHIFT} AS bucket,
                 ({_Z_SQL}) AS z
          FROM lineitem)
    GROUP BY bucket
"""


@bench_only("q_zorder_key")
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (l_partkey, l_suppkey) (operators/layout.py),
    histogrammed into the curve's top-6-bit buckets — pins the exact
    bit-interleave against DuckDB's rendering of the same expression."""
    li = table(spark, sf_dir, "lineitem")
    z = zorder_key(["l_partkey", "l_suppkey"], _Z_BITS)
    return (
        li.select(
            F.shiftright(z, _Z_BUCKET_SHIFT).alias("bucket"), z.alias("z")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
        )
    )
