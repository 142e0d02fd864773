"""Graph-analytics and data-selection queries: integer PageRank over the
customer↔supplier purchase graph, CCNet perplexity terciles, and DSIR
importance selection. All three are bench-queries pinned through melted
suite rows (the driver's gate list is capped); their oracles are full
DuckDB replicas — PageRank's unrolls the integer recurrence iteration by
iteration, so equality is bit-exact, not approximate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import bench_only
from spookystuff_spark.tables import table

PR_ITERS = 8
PR_DAMP = 85  # percent
PR_SCALE = 1_000_000_000


def _pagerank_ctes(iters: int = PR_ITERS) -> str:
    """CTE chain replicating operators/graph.pagerank in pure integer SQL."""
    parts = [
        """
    pr_pairs AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS c,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    pr_edges AS (
      SELECT c AS src, s AS dst FROM pr_pairs
      UNION SELECT s, c FROM pr_pairs),
    pr_nodes AS (SELECT DISTINCT src AS node FROM pr_edges
                 UNION SELECT DISTINCT dst FROM pr_edges),
    pr_n AS (SELECT count(*) AS n FROM pr_nodes),
    pr_deg AS (SELECT src, count(*) AS outd FROM pr_edges GROUP BY src),
    pr0 AS (SELECT node, CAST(%d // n AS BIGINT) AS r
            FROM pr_nodes CROSS JOIN pr_n)"""
        % PR_SCALE
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    pr{i} AS (
      SELECT nd.node,
             CAST((CAST({PR_SCALE} AS BIGINT) * {100 - PR_DAMP})
                    // (100 * nn.n)
                  + ({PR_DAMP} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
      FROM pr_nodes nd CROSS JOIN pr_n nn
      LEFT JOIN (
        SELECT e.dst AS node, sum(p.r // d.outd) AS s
        FROM pr_edges e
        JOIN pr{i - 1} p ON p.node = e.src
        JOIN pr_deg d ON d.src = e.src
        GROUP BY e.dst) s ON s.node = nd.node)"""
        )
    return ",".join(parts)


PAGERANK_CTES = _pagerank_ctes()
ORACLE_PAGERANK = f"""
    WITH {PAGERANK_CTES}
    SELECT node, r AS rank_nano FROM pr{PR_ITERS} ORDER BY node
"""


@bench_only("q_pagerank_purchases")
def q_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank (operators/graph.pagerank) on the bipartite
    customer↔supplier graph induced by lineitem purchases — 'which suppliers
    sit at the center of the order flow'. Gate row lives in q_scalar_suite's
    melt; equality with the unrolled-SQL oracle is bit-exact."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    from spookystuff_spark.operators.graph import pagerank

    # Three shuffle-volume levers vs the naive shape: (1) dedup the
    # undirected pairs BEFORE doubling (halves the distinct); (2) the doubled
    # rows are then unique by construction, so pagerank skips its dedup;
    # (3) node ids ride as LONGS (c -> 2k, s -> 2k+1) through the iteration
    # shuffles — the 'c123'/'s45' labels the oracle pins are minted on the
    # node-cardinality output only.
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(
        edges,
        iterations=PR_ITERS,
        damping_pct=PR_DAMP,
        scale=PR_SCALE,
        assume_distinct=True,
    )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long").cast("string"))
    )
    return ranks.select(label.alias("node"), "rank_nano").orderBy("node")


ORACLE_CCNET = """
    WITH g AS (
      SELECT doc_id, substr(lower(text), i, 3) AS cg
      FROM documents, UNNEST(range(1, length(text)-1)) AS r(i)
      WHERE length(text) >= 3),
    model AS (SELECT cg, count(*) AS cnt FROM g GROUP BY cg),
    tot AS (SELECT sum(cnt) AS total FROM model),
    scored AS (
      SELECT doc_id, round(1e-6 + avg(log10(cnt / total)), 4) AS score
      FROM g JOIN model USING (cg), tot
      GROUP BY doc_id),
    ranked AS (
      SELECT s.doc_id, d.lang, s.score,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY s.score DESC, s.doc_id) AS t
      FROM scored s JOIN documents d USING (doc_id))
    SELECT doc_id, lang, score,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS bucket
    FROM ranked ORDER BY doc_id
"""


@bench_only("q_ccnet_buckets")
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail terciles per language on the corpus-trained
    char-trigram LM (operators/ngram.ccnet_perplexity_buckets). Gate row
    lives in q_text_suite's melt."""
    from spookystuff_spark.operators.ngram import ccnet_perplexity_buckets

    docs = table(spark, sf_dir, "documents")
    return ccnet_perplexity_buckets(docs, "doc_id", "text", "lang").orderBy(
        "doc_id"
    )


DSIR_BUCKETS = 1024
DSIR_K = 100

ORACLE_DSIR = f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
      FROM documents),
    feat AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {DSIR_BUCKETS}
               AS b
      FROM toks),
    tc AS (SELECT b, count(*) AS c FROM feat WHERE lang = 'en' GROUP BY b),
    rc AS (SELECT b, count(*) AS c FROM feat GROUP BY b),
    tt AS (SELECT sum(c) AS t FROM tc),
    rt AS (SELECT sum(c) AS t FROM rc),
    ratio AS (
      SELECT rc.b,
             ln((COALESCE(tc.c, 0) + 1) / (tt.t + {DSIR_BUCKETS}.0))
               - ln((rc.c + 1) / (rt.t + {DSIR_BUCKETS}.0)) AS lr
      FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tt CROSS JOIN rt),
    docw AS (
      SELECT f.doc_id, round(1e-6 + sum(r.lr), 4) AS logw
      FROM feat f JOIN ratio r ON r.b = f.b
      GROUP BY f.doc_id)
    SELECT doc_id, logw FROM docw ORDER BY logw DESC, doc_id LIMIT {DSIR_K}
"""


@bench_only("q_dsir_select")
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance selection (operators/dsir.dsir_select): hashed-unigram
    importance weights toward the English sub-corpus as the target
    distribution; top-{DSIR_K} raw docs by weight. Gate row lives in
    q_text_suite's melt."""
    from spookystuff_spark.operators.dsir import dsir_select

    docs = table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    return dsir_select(
        docs, target, "doc_id", "text", k=DSIR_K, n_buckets=DSIR_BUCKETS
    )
