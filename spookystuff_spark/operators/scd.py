"""Slowly-changing-dimension (SCD type 2) history tables + point-in-time
joins over the lakehouse.

A training-data pipeline that labels facts with dimension attributes MUST
join against the attribute values AS OF each fact's timestamp — joining
today's dimension row onto last year's fact is the classic label-leakage
bug. SCD-2 is the warehouse-standard fix: the dimension table keeps one
row per (key, version) with ``valid_from`` / ``valid_to`` ([from, to)
half-open; ``valid_to`` NULL = current row).

* :func:`scd2_upsert` — fold an update batch into the history table with
  one MERGE on (key, valid_from): unchanged keys are untouched (an
  attr-identical update is a no-op, detected with one hash comparison),
  changed keys close their current row (``valid_to`` = the update's
  effective timestamp) and insert the new version. Cost shape is the
  versioned MERGE's: anti-join + union keyed on the merge key, with the
  tiny update side broadcast.
* :func:`asof_join_scd2` — facts ⋈ the version valid at each fact's
  timestamp. The join is an EQUI-join on the dimension key (each key has
  few versions, so the validity filter after it is cheap and
  skew-bounded) — never an inequality-only plan.

Both engines agree closed-form: applying batches with increasing
effective timestamps yields exactly "all versions per key, valid_to =
lead(valid_from)", which is what the DuckDB oracle of the gate query
recomputes from scratch.

The reference has no dimension-history surface (batch fetch engine);
composed from the rebuild's own versioned MERGE — public Kimball SCD-2
semantics only.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.sources import upsert as U

VALID_FROM = "valid_from"
VALID_TO = "valid_to"


def _attr_cols(df: DataFrame, key_cols: Sequence[str], effective_col: str):
    return [
        c
        for c in df.columns
        if c not in (*key_cols, effective_col, VALID_FROM, VALID_TO)
    ]


def scd2_upsert(
    spark: SparkSession,
    dim_dir: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    effective_col: str = "effective_ts",
) -> str | None:
    """Fold one update batch (one row per key — the latest observation at
    ``effective_col``) into the SCD-2 table at ``dim_dir``. Returns the new
    version, or None when every update was attr-identical to the current
    row (a full no-op batch commits nothing). New keys open their first
    version; changed keys close the current row at the update's effective
    timestamp and insert the new version. An update whose effective
    timestamp does not exceed the current row's ``valid_from`` raises —
    out-of-order history needs a rebuild, not a silent overlap."""
    keys = list(key_cols)
    dup = updates.groupBy(*keys).count().where(F.col("count") > 1)
    attrs = _attr_cols(updates, keys, effective_col)
    new_rows = updates.select(
        *keys,
        *attrs,
        F.col(effective_col).alias(VALID_FROM),
        F.lit(None).cast("long").alias(VALID_TO),
    )
    if U._latest(dim_dir) is None:
        if dup.limit(1).count():
            raise ValueError("scd2_upsert: one row per key per batch")
        U.write_table(new_rows, dim_dir, change_feed=False)
        return U.committed_versions(dim_dir)[-1]

    dim = U.read_table(spark, dim_dir)
    current = dim.where(F.col(VALID_TO).isNull())
    attr_hash = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in attrs]))
    upd = updates.select(
        *keys,
        *[F.col(c).alias(f"_u_{c}") for c in attrs],
        F.col(effective_col).alias("_eff"),
    ).withColumn(
        "_u_hash",
        F.md5(F.concat_ws("\x1f", *[F.col(f"_u_{c}").cast("string") for c in attrs])),
    )
    matched = current.withColumn("_c_hash", attr_hash).join(
        F.broadcast(upd), keys, "inner"
    )
    stale = matched.where(F.col("_eff") <= F.col(VALID_FROM))
    changed = matched.where(F.col("_c_hash") != F.col("_u_hash"))
    # close the current row of every CHANGED key...
    closed = changed.select(
        *keys, *attrs, VALID_FROM, F.col("_eff").alias(VALID_TO)
    )
    # ...and open its new version
    opened = changed.select(
        *keys,
        *[F.col(f"_u_{c}").alias(c) for c in attrs],
        F.col("_eff").alias(VALID_FROM),
        F.lit(None).cast("long").alias(VALID_TO),
    )
    # brand-new keys open their first version
    fresh = new_rows.join(F.broadcast(current.select(*keys)), keys, "left_anti")
    delta = closed.unionByName(opened).unionByName(fresh)
    # ONE probe job answers all three existence questions (duplicate keys,
    # out-of-order history, whole-batch no-op) — the three first-row
    # branches union under a tag instead of running three separate jobs
    # over the same dim ⋈ updates subtree
    probe = (
        dup.select(F.lit("dup").alias("_p")).limit(1)
        .unionAll(stale.select(F.lit("stale").alias("_p")).limit(1))
        .unionAll(delta.select(F.lit("delta").alias("_p")).limit(1))
    )
    flags = {r[0] for r in probe.collect()}
    if "dup" in flags:
        raise ValueError("scd2_upsert: one row per key per batch")
    if "stale" in flags:
        raise ValueError(
            "scd2_upsert: an update's effective timestamp does not exceed "
            "the current row's valid_from — out-of-order history"
        )
    if "delta" not in flags:
        return None  # whole batch attr-identical: nothing to commit
    return U.upsert(
        spark, dim_dir, delta, [*keys, VALID_FROM], change_feed=False
    )


def asof_join_scd2(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Facts joined to the dimension version valid at each fact's
    timestamp: equi-join on the key, then the [valid_from, valid_to)
    validity filter — facts before a key's first version drop (inner
    semantics), facts at or after the last keep the open row."""
    keys = list(key_cols)
    validity = (F.col(ts_col) >= F.col(VALID_FROM)) & (
        F.col(VALID_TO).isNull() | (F.col(ts_col) < F.col(VALID_TO))
    )
    return facts.join(dim, keys, "inner").where(validity)


def scd2_sql(
    batches_sql: Sequence[tuple[str, str]],
    key_sql: str,
    attr_sql: Sequence[str],
) -> str:
    """DuckDB oracle: the closed-form SCD-2 state after applying
    ``batches_sql`` = [(select, effective_ts_expr), ...] IN ORDER with
    strictly increasing effective timestamps — all versions per key with
    ``valid_to = lead(valid_from)``, attr-identical consecutive versions
    collapsed."""
    attrs = ", ".join(attr_sql)
    unions = " UNION ALL ".join(
        f"SELECT {key_sql} AS k, {attrs}, {eff} AS vf FROM ({sel})"
        for sel, eff in batches_sql
    )
    attr_concat = " || chr(31) || ".join(
        f"COALESCE(CAST({a.split(' AS ')[-1]} AS VARCHAR), '')" for a in attr_sql
    )
    return f"""
WITH obs AS ({unions}),
dedup AS (
  SELECT *, lag({attr_concat}) OVER (PARTITION BY k ORDER BY vf) AS prev_sig
  FROM obs
), versions AS (
  SELECT * FROM dedup
  WHERE prev_sig IS NULL OR prev_sig <> {attr_concat}
)
SELECT k, {", ".join(a.split(' AS ')[-1] for a in attr_sql)},
       vf AS valid_from,
       lead(vf) OVER (PARTITION BY k ORDER BY vf) AS valid_to
FROM versions"""


def streaming_scd2_sink(
    dim_dir: str,
    key_cols: Sequence[str],
    effective_col: str = "effective_ts",
):
    """``foreachBatch`` body maintaining the SCD-2 history from a stream of
    dimension observations: each micro-batch keeps only its LATEST row per
    key (a batch can carry several observations of one key; intermediate
    flickers within one batch collapse — standard streaming-SCD semantics)
    and folds through :func:`scd2_upsert`. Attr-identical batches commit
    nothing, so replays of an already-applied batch are natural no-ops."""
    from pyspark.sql.window import Window

    keys = list(key_cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(*keys).orderBy(F.col(effective_col).desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        if latest.limit(1).count() == 0:
            return
        scd2_upsert(
            batch_df.sparkSession, dim_dir, latest, keys, effective_col
        )

    return sink
