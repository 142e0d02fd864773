"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + LLM ops).
``oracle_sql()`` — DuckDB-equivalent SQL per query (column names aligned).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spookystuff_spark.queries import QUERIES, load_all_query_modules

    load_all_query_modules()
    return QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spookystuff_spark.queries import QUERIES, load_all_query_modules

    load_all_query_modules()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from spookystuff_spark.queries import ORACLE, load_all_query_modules

    load_all_query_modules()
    return dict(ORACLE)
