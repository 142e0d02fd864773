"""Loaders for the driver's synthetic TPC-H-ish corpus (TESTDATA.md).

All loads go through ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning and partition-sized splits for free — at 100 TB the same call
scans only the referenced columns/row-groups.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor; at 100 TB the
# fact tables grow but these stay O(nations)=25 / O(regions)=5 / O(suppliers).
BROADCAST_TABLES = {"region", "nation", "supplier"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS) which the vectorized
        # parquet reader rejects; read nanos as long and truncate to micros
        # (integer div — no double round-trip), matching DuckDB's behavior.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
