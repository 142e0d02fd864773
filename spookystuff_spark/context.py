"""SpookyContext — session object wrapping SparkSession
(ref: module/core/.../SpookyContext.scala:78-262).

Thin by design: the reference carries a plugin registry, Hadoop-conf broadcast
and metrics; here Spark already ships the session everywhere, so the context
only holds conf + metrics and builds DataViews.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.metrics import SpookyMetrics


class SpookyContext:
    def __init__(self, spark: SparkSession, conf: Optional[SpookyConf] = None):
        self.spark = spark
        self.conf = conf or SpookyConf()
        self.metrics = SpookyMetrics(spark.sparkContext)

    # --- ingestion (ref: SpookyContext.scala:209-261, execution/RDDPlan.scala:8-18)

    def create(self, data: Any, num_partitions: Optional[int] = None) -> "DataView":
        """Wrap input into a DataView with an empty (NoOp) trace.

        Accepts a DataFrame, or an iterable of scalars / dicts / tuples.
        """
        from spookystuff_spark.plans.dataview import DataView

        if isinstance(data, DataFrame):
            df = data
        else:
            rows = list(data)
            if rows and not isinstance(rows[0], (dict, tuple)):
                rows = [{"_": v} for v in rows]
            df = self.spark.createDataFrame(rows)  # type: ignore[arg-type]
        if num_partitions:
            df = df.repartition(num_partitions)
        return DataView.of_df(self, df)

    def create_blank(self) -> "DataView":
        """One empty row — the seed for pipelines that start from a fetch."""
        from spookystuff_spark.plans.dataview import DataView

        return DataView.of_df(self, self.spark.range(1).select())

    def __repr__(self) -> str:
        return f"SpookyContext({self.spark.sparkContext.master}, {self.metrics})"
