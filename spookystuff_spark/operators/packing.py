"""Sequence packing & deterministic dataset splitting for pretraining
pipelines.

The reference engine stops at document curation (SURVEY.md §2 scope); these
are rebuild-native operators covering the last mile of a training-data
pipeline:

* ``pack_sequences`` — GPT-style *concat-and-chunk* packing: within each
  shard, documents are concatenated in a deterministic order and chopped into
  fixed token-length sequences; a document crossing a sequence boundary is
  split across the two sequences. The whole operator is Catalyst-native
  integer arithmetic — one window cumulative sum + one ``sequence``/``explode``
  — so it survives any scale: the only shuffle is the shard window sort, and
  shards are independent (at 100 TB, one shard ≈ one output file group; skew
  is bounded because the shard key is a uniform hash of the doc id).
* ``hash_split`` — stable train/val/test assignment by md5 of a salted key.
  Hex-string comparison (fixed width, lowercase) equals numeric comparison,
  so the same expression runs on any engine; re-running on a grown corpus
  never reassigns an existing key (the property random splits lack).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# Portable whitespace tokenizer (matches queries/hygiene.py & curation.py):
# regexp_extract_all(lower(text), '\S+') on both Spark and DuckDB.
TOKEN_RE = r"(\S+)"


def token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 1))


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing plan.

    Output: one row per (document × overlapped sequence) span —
      shard        int   uniform shard (doc_id mod n_shards)
      seq_id       bigint sequence index within the shard
      doc_id       bigint
      seq_off      int   offset of this span inside the sequence
      tok_start    int   first token of the doc included in this span
      tok_end      int   one past the last token included
      n_tok        int   span length (== tok_end - tok_start)

    Every sequence except each shard's last is exactly ``seq_len`` tokens with
    zero padding waste — the property bin-packing approximations trade away.
    """
    L = F.lit(seq_len)
    toks = token_count(F.col(text_col))
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
            toks.cast("bigint").alias("toks"),
        )
        .where(F.col("toks") > 0)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn("start", F.coalesce(F.sum("toks").over(w), F.lit(0)))
    first_seq = F.floor(F.col("start") / L)
    last_seq = F.floor((F.col("start") + F.col("toks") - 1) / L)
    s = c.select(
        "shard",
        "doc_id",
        "toks",
        "start",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_base = F.col("seq_id") * L
    tok_start = F.greatest(seq_base - F.col("start"), F.lit(0))
    tok_end = F.least(seq_base + L - F.col("start"), F.col("toks"))
    return s.select(
        "shard",
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "doc_id",
        F.greatest(F.col("start") - seq_base, F.lit(0)).cast("int").alias("seq_off"),
        tok_start.cast("int").alias("tok_start"),
        tok_end.cast("int").alias("tok_end"),
        (tok_end - tok_start).cast("int").alias("n_tok"),
    )


def pack_sequences_sql(
    docs_sql: str, seq_len: int = 256, n_shards: int = 8
) -> str:
    """DuckDB twin of :func:`pack_sequences` (oracle)."""
    return f"""
WITH d AS (
  SELECT doc_id, CAST(doc_id % {n_shards} AS INTEGER) AS shard,
         CAST(len(regexp_extract_all(lower(text), '\\S+')) AS BIGINT) AS toks
  FROM ({docs_sql})
), d2 AS (SELECT * FROM d WHERE toks > 0),
c AS (
  SELECT *, COALESCE(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM d2),
s AS (
  SELECT shard, doc_id, toks, start,
         unnest(generate_series(CAST(start // {seq_len} AS BIGINT),
                                CAST((start + toks - 1) // {seq_len} AS BIGINT)))
           AS seq_id
  FROM c)
SELECT shard, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       CAST(GREATEST(start - seq_id * {seq_len}, 0) AS INTEGER) AS seq_off,
       CAST(GREATEST(seq_id * {seq_len} - start, 0) AS INTEGER) AS tok_start,
       CAST(LEAST((seq_id + 1) * {seq_len} - start, toks) AS INTEGER) AS tok_end,
       CAST(LEAST((seq_id + 1) * {seq_len} - start, toks)
            - GREATEST(seq_id * {seq_len} - start, 0) AS INTEGER) AS n_tok
FROM s"""


def _cum_hex_thresholds(weights: Mapping[str, float]) -> Sequence[tuple[str, str]]:
    """(split_name, exclusive upper bound as 4-hex-digit string), in order."""
    total = sum(weights.values())
    out, acc = [], 0.0
    for name, wgt in weights.items():
        acc += wgt / total
        # split gets buckets in [prev_bound, bound): inclusive hex upper bound
        bound = min(int(acc * 65536), 65536)
        out.append((name, f"{max(bound - 1, 0):04x}"))
    return out


def split_bucket(key: Column, salt: str = "split-v1") -> Column:
    """4-hex-digit md5 bucket of the salted key — lexicographic order on the
    fixed-width lowercase hex equals numeric order, so engines agree."""
    return F.substring(F.md5(F.concat_ws("|", F.lit(salt), key.cast("string"))), 1, 4)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Append a ``split`` column ('train'/'val'/'test' by default) assigned by
    deterministic hash of ``key_col``. Narrow (no shuffle); stable under
    corpus growth and re-runs."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = split_bucket(F.col(key_col), salt)
    names = list(weights)
    expr = F.lit(names[-1])
    col = None
    for name, bound in _cum_hex_thresholds(weights)[:-1]:
        cond = bucket <= F.lit(bound)
        col = F.when(cond, name) if col is None else col.when(cond, name)
    expr = col.otherwise(names[-1]) if col is not None else expr
    return df.withColumn("split", expr)


def hash_split_case_sql(
    key_sql: str,
    weights: Mapping[str, float] | None = None,
    salt: str = "split-v1",
) -> str:
    """DuckDB CASE expression matching :func:`hash_split`."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = f"substr(md5(concat_ws('|', '{salt}', CAST({key_sql} AS VARCHAR))), 1, 4)"
    names = list(weights)
    arms = "".join(
        f" WHEN {bucket} <= '{bound}' THEN '{name}'"
        for name, bound in _cum_hex_thresholds(weights)[:-1]
    )
    return f"CASE{arms} ELSE '{names[-1]}' END"


def deterministic_shuffle(
    df: DataFrame, key_col: str, salt: str = "shuffle-v1"
) -> DataFrame:
    """Reproducible global shuffle: total order by md5(salt || key). The
    standard pre-training data ordering — unbiased w.r.t. any source/time
    ordering, identical on every rerun and every engine, and re-saltable per
    epoch (salt = f"epoch-{n}") without moving bytes twice. One range-sort
    exchange; at 100 TB write the result partitioned to make the order
    durable."""
    return df.orderBy(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))),
        F.col(key_col),
    )
