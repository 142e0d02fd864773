"""Sketch queries: HLL distinct, Count-Min frequency, KMV distinct — each
individually benchmarked (``bench_only``) and value-pinned through the
q_scalar_suite melt (queries/melt_suites.py). The DuckDB oracles replay the
md5 register/bucket/rank arithmetic exactly (operators/sketch.py docstring),
so these are full value matches, not error-bar checks."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import bench_only
from spookystuff_spark.tables import table

CMS_TERMS = [
    "spark", "table", "query", "join", "filter",
    "window", "stream", "the", "zebra",
]
_CMS_DEPTH, _CMS_WIDTH = 4, 1024
_KMV_K = 16

# --- HLL: approximate distinct users per event_type ---------------------
ORACLE_HLL_USERS = """
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 3))::BIGINT AS reg,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 4, 13))::BIGINT AS w
      FROM events
    ), r AS (
      SELECT event_type, reg,
             max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
      FROM h GROUP BY 1, 2
    ), g AS (
      SELECT event_type, count(*) AS cnt,
             sum(1::BIGINT << (53 - rho)) AS s_present
      FROM r GROUP BY 1
    ), e AS (
      SELECT event_type, cnt,
             (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
               * 9007199254740992.0
               / (CAST(s_present AS DOUBLE)
                  + (4096 - cnt) * 9007199254740992.0) AS raw
      FROM g
    )
    SELECT event_type,
           round(1e-6 + CASE WHEN raw <= 2.5 * 4096 AND (4096 - cnt) > 0
                             THEN 4096.0 * ln(4096.0 / (4096 - cnt))
                             ELSE raw END, 2) AS est_distinct,
           CAST(4096 - cnt AS BIGINT) AS zero_regs
    FROM e
    """


@bench_only("q_hll_distinct_users")
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event_type via own HLL (p=12): the
    shuffle carries at most 4096 register rows per group instead of every
    distinct user — the count(DISTINCT) shape that survives 100 TB."""
    from spookystuff_spark.operators.sketch import hll_estimate

    ev = table(spark, sf_dir, "events")
    return hll_estimate(ev, ["event_type"], "user_id", p=12)


# --- Count-Min: token frequency point queries ---------------------------
_CMS_TERM_VALUES = ", ".join(f"('{t}')" for t in CMS_TERMS)
ORACLE_CMS_TOKENS = f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '(\\S+)', 1)) AS tok
      FROM documents
    ), tj AS (
      SELECT r.j, tok FROM toks CROSS JOIN range({_CMS_DEPTH}) AS r(j)
    ), sk AS (
      SELECT j,
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 12))::BIGINT
               % {_CMS_WIDTH} AS bucket,
             count(*) AS c
      FROM tj GROUP BY 1, 2
    ), probes AS (
      SELECT t.term, r.j,
             ('0x' || substr(md5(CAST(r.j AS VARCHAR) || ':' || t.term), 1, 12))::BIGINT
               % {_CMS_WIDTH} AS bucket
      FROM (VALUES {_CMS_TERM_VALUES}) AS t(term)
      CROSS JOIN range({_CMS_DEPTH}) AS r(j)
    )
    SELECT term, min(coalesce(sk.c, 0)) AS est
    FROM probes LEFT JOIN sk USING (j, bucket)
    GROUP BY term
    """


@bench_only("q_cms_token_freq")
def q_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point queries for a fixed term list ('zebra' is absent from
    the corpus — its row shows pure collision mass). The sketch is a fixed
    4x1024 grid: the aggregation shuffles <= 4096 keys no matter how large
    the vocabulary, and the probe join broadcasts the sketch."""
    from spookystuff_spark.operators.layout import spread_small_input
    from spookystuff_spark.operators.sketch import cms_query, cms_sketch

    docs = spread_small_input(table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"(\S+)"), 1)
        ).alias("tok")
    )
    sk = cms_sketch(toks, "tok", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    return cms_query(spark, sk, CMS_TERMS, depth=_CMS_DEPTH, width=_CMS_WIDTH)


# --- KMV: approximate distinct vocabulary per language ------------------
ORACLE_KMV_VOCAB = f"""
    WITH toks AS (
      SELECT lang,
             unnest(regexp_extract_all(lower(text), '(\\S+)', 1)) AS tok
      FROM documents
    ), g AS (
      SELECT lang, substr(md5(tok), 1, 15) AS h
      FROM toks GROUP BY 1, 2
    ), ranked AS (
      SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
      FROM g
    ), agg AS (
      SELECT lang, max(rn) AS cnt, max(h) AS hk
      FROM ranked WHERE rn <= {_KMV_K} GROUP BY 1
    )
    SELECT lang,
           round(1e-6 + CASE WHEN cnt < {_KMV_K} THEN CAST(cnt AS DOUBLE)
                 ELSE {float((_KMV_K - 1) * (1 << 60))}
                      / CAST(('0x' || hk)::BIGINT AS DOUBLE) END, 2)
             AS est_distinct
    FROM agg
    """


@bench_only("q_kmv_distinct_vocab")
def q_kmv_distinct_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k=16) distinct-vocabulary estimate per language: duplicates
    collapse map-side in the (lang, hash) partial agg, and only the 16
    smallest hashes per group reach the estimator."""
    from spookystuff_spark.operators.sketch import kmv_estimate

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"(\S+)"), 1)
        ).alias("tok"),
    )
    return kmv_estimate(toks, ["lang"], "tok", k=_KMV_K)


# --- deterministic-sample quantiles -------------------------------------
_QS = (0.25, 0.5, 0.75, 0.95)
_QCAP = 2000
ORACLE_SAMPLE_QUANTILES = f"""
    WITH counts AS (
      SELECT l_returnflag AS grp, count(*) AS n FROM lineitem GROUP BY 1
    ), src AS (
      SELECT l.l_returnflag AS grp, l.l_extendedprice AS v,
             ('0x' || substr(md5(CAST(l.l_orderkey AS VARCHAR) || ':'
                || CAST(l.l_linenumber AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS hf,
             c.n
      FROM lineitem l JOIN counts c ON c.grp = l.l_returnflag
    ), samp AS (
      SELECT grp, v FROM src WHERE hf < least(1.0, {float(_QCAP)} / n)
    ), ranked AS (
      SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
      FROM samp
    ), sizes AS (
      SELECT grp, max(rn) AS m FROM ranked GROUP BY 1
    ), targets AS (
      SELECT s.grp, CAST(q.q AS DOUBLE) AS q,
             CAST(floor(CAST(q.q AS DOUBLE) * (s.m - 1)) AS BIGINT) + 1 AS trn
      FROM sizes s CROSS JOIN (
        VALUES {", ".join(f"({q})" for q in _QS)}) AS q(q)
    )
    SELECT t.grp, t.q, r.v AS value
    FROM targets t JOIN ranked r ON r.grp = t.grp AND r.rn = t.trn
    """


@bench_only("q_sample_quantiles")
def q_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag price quantiles over the deterministic hash-fraction
    sample (operators/sketch.py::sample_quantiles) — the portable
    approx_percentile: the per-group sort ranks ~cap rows, never the fact
    table, and membership survives any repartition."""
    from spookystuff_spark.operators.sketch import sample_quantiles

    li = table(spark, sf_dir, "lineitem")
    id_expr = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    return sample_quantiles(
        li.withColumnRenamed("l_returnflag", "grp"),
        ["grp"], "l_extendedprice", id_expr, _QS, cap=_QCAP,
    )


# --- weighted sampling without replacement ------------------------------
_WS_K, _WS_SALT = 5, "ws-v1"
ORACLE_WEIGHTED_SAMPLE = f"""
    SELECT lang, doc_id, rn FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY round(-ln((('0x' || substr(md5('{_WS_SALT}|'
                        || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT)
                        / 281474976710656.0) / n_chars + 1e-12, 9),
                        doc_id) AS rn
      FROM documents)
    WHERE rn <= {_WS_K}
    """


@bench_only("q_weighted_sample")
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted doc sampling per language (Efraimidis-Spirakis
    exponential race, operators/sampling.py): inclusion probability
    proportional to n_chars, membership deterministic and layout-independent."""
    from spookystuff_spark.operators.sampling import weighted_sample_topk

    docs = table(spark, sf_dir, "documents")
    return weighted_sample_topk(
        docs, ["lang"], "doc_id", "n_chars", k=_WS_K, salt=_WS_SALT
    )


_KMVSET_K = 64

ORACLE_KMV_OVERLAP = f"""
    WITH t AS (
      SELECT lang, regexp_extract_all(lower(text), '(\\S+)', 1) AS ts
      FROM documents
    ), toks AS (
      SELECT lang, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS tok
      FROM t, unnest(range(1, len(ts) - 1)) AS r(i)
      WHERE len(ts) >= 3
    ), g AS (
      SELECT lang, substr(md5(tok), 1, 15) AS h
      FROM toks GROUP BY 1, 2
    ), ranked AS (
      SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
      FROM g
    ), sk AS (
      SELECT lang, list_sort(list(h)) AS hs
      FROM ranked WHERE rn <= {_KMVSET_K} GROUP BY 1
    ), p AS (
      SELECT a.lang AS group_a, b.lang AS group_b, a.hs AS ha, b.hs AS hb
      FROM sk a JOIN sk b ON a.lang < b.lang
    ), c AS (
      SELECT group_a, group_b, ha, hb,
             (list_sort(list_distinct(list_concat(ha, hb))))[1:{_KMVSET_K}] AS u
      FROM p
    ), m AS (
      SELECT group_a, group_b,
             len(ha) AS na, ha[len(ha)] AS hk_a,
             len(hb) AS nb, hb[len(hb)] AS hk_b,
             len(u) AS un, u[len(u)] AS hk_u,
             len(list_intersect(list_intersect(ha, hb), u)) AS rho_n
      FROM c
    ), e AS (
      SELECT group_a, group_b, rho_n, un,
        CASE WHEN na < {_KMVSET_K} THEN CAST(na AS DOUBLE)
             ELSE {float((_KMVSET_K - 1) * (1 << 60))}
                  / CAST(('0x' || hk_a)::BIGINT AS DOUBLE) END AS est_a,
        CASE WHEN nb < {_KMVSET_K} THEN CAST(nb AS DOUBLE)
             ELSE {float((_KMVSET_K - 1) * (1 << 60))}
                  / CAST(('0x' || hk_b)::BIGINT AS DOUBLE) END AS est_b,
        CASE WHEN un < {_KMVSET_K} THEN CAST(un AS DOUBLE)
             ELSE {float((_KMVSET_K - 1) * (1 << 60))}
                  / CAST(('0x' || hk_u)::BIGINT AS DOUBLE) END AS est_union
      FROM m
    )
    SELECT group_a, group_b,
           round(1e-6 + est_a, 2) AS est_a,
           round(1e-6 + est_b, 2) AS est_b,
           round(1e-6 + est_union, 2) AS est_union,
           round(1e-6 + (CAST(rho_n AS DOUBLE) / un) * est_union, 2)
             AS est_intersection,
           round(1e-6 + CAST(rho_n AS DOUBLE) / un, 6) AS jaccard,
           round(1e-6 + ((CAST(rho_n AS DOUBLE) / un) * est_union) / est_a, 6)
             AS containment_a_in_b
    FROM e
    """


@bench_only("q_kmv_overlap")
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise token-vocabulary overlap between languages from KMV
    sketches (union / intersection / Jaccard / containment estimates) —
    the data-discovery joinability profile, value-pinned through
    ``q_scalar_suite``'s melt (the DuckDB oracle replays the sketch
    arithmetic exactly)."""
    from spookystuff_spark.operators.sketch import kmv_pairwise_overlap

    docs = table(spark, sf_dir, "documents")
    # word TRIGRAM vocabularies: the synthetic corpus shares one unigram
    # wordlist across languages (jaccard 1.0 — degenerate); trigram sets
    # separate (~0.07-0.11 true jaccard, asymmetric containment), so the
    # estimates are actually informative
    toks = (
        docs.select(
            "lang",
            F.expr(r"regexp_extract_all(lower(text), '(\\S+)', 1)").alias("ts"),
        )
        .select(
            "lang",
            F.explode(
                F.expr(
                    "CASE WHEN size(ts) >= 3 THEN transform("
                    "  sequence(0, size(ts) - 3),"
                    "  i -> concat_ws(' ', ts[i], ts[i + 1], ts[i + 2]))"
                    "ELSE array() END"
                )
            ).alias("tok"),
        )
    )
    return kmv_pairwise_overlap(toks, "lang", "tok", k=_KMVSET_K)
