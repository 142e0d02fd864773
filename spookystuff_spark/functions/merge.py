"""Record-merge semantics from the linq module (ref: module/linq/.../Rec.scala:72-120,
linq/internal/ElementWisePoly.scala:19-136, linq/Field.scala:63-75,
linq/Foundation.scala:54-122).

The reference's compile-time HList records map to plain Spark columns; the
merge *policies* are what carries over:

* ``error``            (``+!+`` ifNoConflict)   — duplicate column → raise
* ``prefer_right``     (``+<+`` / ``++``)       — new value wins
* ``prefer_left``      (``+>+``)                — existing value wins
* ``replace_if_not_null`` (Field.ReplaceIfNotNull) — new value wins unless null
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

POLICIES = ("error", "prefer_right", "prefer_left", "replace_if_not_null")


def with_columns_merged(
    df: DataFrame, policy: str = "error", **cols: Column
) -> DataFrame:
    if policy not in POLICIES:
        raise ValueError(f"unknown merge policy {policy!r}; one of {POLICIES}")
    existing = set(df.columns)
    out = df
    for name, col in cols.items():
        if name not in existing:
            out = out.withColumn(name, col)
        elif policy == "error":
            raise ValueError(
                f"column {name!r} already exists (merge policy 'error', "
                "ref: linq ifNoConflict +!+)"
            )
        elif policy == "prefer_left":
            continue  # existing wins
        elif policy == "prefer_right":
            out = out.withColumn(name, col)
        elif policy == "replace_if_not_null":
            out = out.withColumn(name, F.coalesce(col, F.col(name)))
    return out


def explode_field(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """linq ``RowFunctions.explode`` parity (linq/RowFunctions.scala:14-27):
    unnest an array field into one row per element, keeping other columns."""
    out_col = out_col or col
    others = [c for c in df.columns if c != col]
    return df.select(*others, F.explode_outer(F.col(col)).alias(out_col))
