"""spark.sql surface: register the corpus as temp views so every operator
result is reachable from SQL text (the second first-class query API beside
DataFrames — same Catalyst plans either way).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from spookystuff_spark.tables import TABLES, table


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """CREATE OR REPLACE TEMP VIEW for every corpus table (idempotent)."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(f"{t}{suffix}")


def sql(spark: SparkSession, sf_dir: str, query: str):
    """Run SQL text against the registered corpus views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
