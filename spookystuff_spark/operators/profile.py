"""Column profiling (ANALYZE TABLE / data-quality summary), exact and
engine-portable.

One wide aggregate computes every metric for every profiled column in a
single pass over the table — n_rows, per-column null count, EXACT
distinct count, and type-appropriate extras (min/max/mean for numerics,
min/max/avg length for strings). Output is melt-shaped
``(column, metric, v_num)`` so it rides the correctness gate directly.

Scale notes: everything except the distinct counts collapses map-side
into one partial-aggregate row per task. Multiple ``count(DISTINCT ...)``
in one aggregate triggers Spark's EXPAND rewrite (one duplicated stream
per distinct column) — exact, deterministic, and the honest cost of
exact ANALYZE; callers profiling hundred-column tables at 100 TB should
pass a column subset or use the KMV/HLL sketches
(``operators/sketch.py``) where ±1% suffices.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spookystuff_spark.functions.rounding import round_stable

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal", "long"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """→ (column, metric, v_num) melt rows, one aggregate job."""
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
        if _is_numeric(dtypes[c]):
            aggs += [
                F.min(c).cast("double").alias(f"_min_{c}"),
                F.max(c).cast("double").alias(f"_max_{c}"),
                round_stable(F.avg(c), 4).alias(f"_mean_{c}"),
            ]
        elif dtypes[c] == "string":
            aggs += [
                F.min(F.length(c)).cast("double").alias(f"_min_{c}"),
                F.max(F.length(c)).cast("double").alias(f"_max_{c}"),
                round_stable(F.avg(F.length(c)), 4).alias(f"_mean_{c}"),
            ]
    row = df.agg(*aggs).first()
    out = []
    for c in cols:
        out.append((c, "n_rows", float(row["_n"])))
        out.append((c, "n_null", float(row[f"_null_{c}"])))
        out.append((c, "n_distinct", float(row[f"_dist_{c}"])))
        for m in ("min", "max", "mean"):
            key = f"_{m}_{c}"
            if key in row.asDict():
                v = row[key]
                out.append((c, m, float(v) if v is not None else None))
    return df.sparkSession.createDataFrame(
        out, "column string, metric string, v_num double"
    )


def profile_sql(table_sql: str, cols: Sequence[tuple[str, str]]) -> str:
    """DuckDB twin: ``cols`` = [(name, 'numeric'|'string'), ...]."""
    parts = []
    for c, kind in cols:
        expr = c if kind == "numeric" else f"len({c})"
        parts += [
            f"SELECT '{c}' AS column, 'n_rows' AS metric, "
            f"CAST(count(*) AS DOUBLE) AS v_num FROM t",
            f"SELECT '{c}', 'n_null', CAST(count(*) FILTER ({c} IS NULL) "
            f"AS DOUBLE) FROM t",
            f"SELECT '{c}', 'n_distinct', CAST(count(DISTINCT {c}) AS DOUBLE) "
            f"FROM t",
            f"SELECT '{c}', 'min', CAST(min({expr}) AS DOUBLE) FROM t",
            f"SELECT '{c}', 'max', CAST(max({expr}) AS DOUBLE) FROM t",
            f"SELECT '{c}', 'mean', round(1e-6 + avg({expr}), 4) FROM t",
        ]
    return f"WITH t AS ({table_sql}) " + " UNION ALL ".join(parts)
