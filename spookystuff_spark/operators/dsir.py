"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023).

Select raw-corpus documents that look like a target distribution using hashed
n-gram importance weights: bucket every token by a hash, fit two smoothed
bucket-multinomials (target p, raw q), and weight each document by
``log w(x) = Σ_tokens  log p[b(tok)] − log q[b(tok)]``. Selection takes the
top-weighted docs (the deterministic temperature→0 limit of the paper's
Gumbel-top-k resampling — reproducible across engines and runs).

Scale shape: the token stream collapses map-side to (doc, bucket, cnt) via a
partial-aggregated groupBy — the shuffle is bounded by ``n_buckets`` per doc,
not document length. Both bucket tables are ≤ ``n_buckets`` rows and broadcast
into the per-doc scoring join; one final groupBy(doc) sums the weights. The
bucket hash is the engine-portable md5 idiom (DuckDB:
``CAST('0x'||substr(md5(tok),1,8) AS BIGINT) % B``) so a SQL oracle can
replicate the weights bit-for-bit up to float-sum rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bucket(tok: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % n_buckets
    )


def _doc_bucket_counts(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """→ (id, bucket, cnt): hashed-unigram occurrence counts per doc.

    The explode never reaches an exchange at token granularity — Catalyst
    partial-aggregates (id, bucket) map-side before the shuffle.
    """
    # same tokenizer the oracles mirror (ngram.py:_TOKENS group-idx trap)
    tok = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"(\S+)"), 1)
    ).alias("__tok")
    return (
        df.select(F.col(id_col).alias("__id"), tok)
        .select("__id", _bucket(F.col("__tok"), n_buckets).alias("__b"))
        .groupBy("__id", "__b")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def dsir_log_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """→ (id_col, logw): per-doc hashed-n-gram importance log-weight.

    ``target`` is the distribution to move toward (e.g. curated/wiki-like
    docs); ``corpus`` is the raw pool being scored. Laplace +1 smoothing on
    both multinomials keeps unseen buckets finite.
    """
    raw = _doc_bucket_counts(corpus, id_col, text_col, n_buckets).persist()
    tgt = _doc_bucket_counts(target, id_col, text_col, n_buckets)

    raw_b = raw.groupBy("__b").agg(F.sum("__cnt").alias("__rc"))
    tgt_b = tgt.groupBy("__b").agg(F.sum("__cnt").alias("__tc"))
    # bucket log-ratio table: ≤ n_buckets rows, broadcast into the doc join
    ratio = (
        raw_b.join(tgt_b, "__b", "left")
        .crossJoin(
            F.broadcast(raw_b.agg(F.sum("__rc").alias("__rt")))
        )
        .crossJoin(
            F.broadcast(tgt_b.agg(F.sum("__tc").alias("__tt")))
        )
        .select(
            "__b",
            (
                F.log(
                    (F.coalesce(F.col("__tc"), F.lit(0)) + 1)
                    / (F.col("__tt") + float(n_buckets))
                )
                - F.log((F.col("__rc") + 1) / (F.col("__rt") + float(n_buckets)))
            ).alias("__lr"),
        )
    )
    out = (
        raw.join(F.broadcast(ratio), "__b")
        .groupBy("__id")
        .agg(F.sum(F.col("__cnt") * F.col("__lr")).alias("logw"))
        .select(F.col("__id").alias(id_col), "logw")
    )
    out = out.localCheckpoint(eager=True)
    raw.unpersist()
    return out


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """Top-``k`` corpus docs by DSIR importance weight (ties → smaller id).

    The top-k is a TakeOrderedAndProject (no full sort at scale); the weight
    is quantized to 4 dp before ranking so the ordering is reproducible
    across engines' float-summation orders.
    """
    from spookystuff_spark.functions.rounding import round_stable

    w = dsir_log_weights(corpus, target, id_col, text_col, n_buckets)
    scored = w.select(id_col, round_stable(F.col("logw"), 4).alias("logw"))
    return scored.orderBy(F.col("logw").desc(), F.col(id_col)).limit(k)
