"""Hive-partitioned parquet layout: partitioned writes with dynamic
overwrite, and partition-pruning verification.

At 100 TB, partition pruning is the first and cheapest form of data
skipping: a filter on the partition column never touches the excluded
directories — zero tasks, zero IO, decided at planning time from the file
index alone. These helpers make the two halves explicit:

* ``write_partitioned`` — dynamic partition overwrite (only the partitions
  present in ``df`` are replaced; the backfill/restatement idiom — a static
  overwrite would silently truncate every other partition).
* ``prune_report`` / ``assert_partition_pruned`` — read back the physical
  plan's file index and prove the filter pruned: selected-partition count
  must drop. Plan-quality tests use this the way test_plan_quality.py
  asserts broadcasts; a scan that reads all partitions for a one-partition
  predicate is a silent 100×-scale bug.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` partitioned by ``partition_cols`` with DYNAMIC partition
    overwrite: only partitions with incoming rows are replaced."""
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .mode(mode)
        .parquet(path)
    )


def prune_report(df: DataFrame) -> dict:
    """Parse the formatted physical plan of a file-scan ``df``:
    {partition_filters, pushed_filters, read_schema} — the three lines that
    decide how much of the table a query actually touches."""
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    def grab(field: str) -> str:
        m = re.search(rf"{field}: \[(.*?)\]", plan)
        return m.group(1) if m else ""

    return {
        "partition_filters": grab("PartitionFilters"),
        "pushed_filters": grab("PushedFilters"),
        "read_schema": grab("ReadSchema") or (
            re.search(r"ReadSchema: (\S+)", plan).group(1)
            if re.search(r"ReadSchema: (\S+)", plan)
            else ""
        ),
    }


def selected_partition_count(df: DataFrame) -> int:
    """Number of partition directories the planned scan will actually read
    (after pruning) — from the FileSourceScanExec's selected partitions."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    # walk the physical plan for the FileSourceScan node; its
    # selectedPartitions is a ScanFileListing (post-pruning view)
    it = plan.collectLeaves().iterator()
    while it.hasNext():
        node = it.next()
        if node.nodeName().startswith("Scan parquet"):
            return node.selectedPartitions().partitionCount()
    raise ValueError("no parquet file scan in plan")


def assert_partition_pruned(
    spark: SparkSession,
    path: str,
    predicate: str,
    expect_at_most: int,
) -> DataFrame:
    """Read ``path`` with ``predicate`` and fail unless the planner pruned to
    ≤ ``expect_at_most`` partition directories. Returns the filtered frame."""
    df = spark.read.parquet(path).where(predicate)
    n = selected_partition_count(df)
    if n > expect_at_most:
        raise AssertionError(
            f"partition pruning failed: {n} partitions selected for "
            f"{predicate!r}, expected <= {expect_at_most}"
        )
    return df
