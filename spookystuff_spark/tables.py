"""Loaders for the driver's synthetic TPC-H-ish corpus (TESTDATA.md).

All loads go through ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning and partition-sized splits for free — at 100 TB the same call
scans only the referenced columns/row-groups.
"""

from __future__ import annotations

from contextlib import contextmanager

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


# Scan-sharing overrides for melted suite queries: a suite unions ~10
# constituent pipelines that each re-scan the same base tables; sharing one
# materialization per table cuts that to a single pass. The mechanism is
# ``localCheckpoint(eager=False)`` — RDD-level storage, computed at the
# suite's first action and reused by every later branch — NOT ``persist()``:
# persist registers in Catalyst's CacheManager, which then silently
# substitutes the cached FULL TABLE into every unrelated later query on the
# same table, destroying parquet pushdown/pruning session-wide (at 100 TB,
# catastrophic). RDD-level blocks are invisible to plan substitution and are
# reclaimed by the ContextCleaner when the suite's DataFrame is GC'd. The
# stack only scopes PLAN CONSTRUCTION (the suite body); within a suite,
# broadcast decisions on the checkpointed (stats-free) frames are recovered
# at runtime by AQE.
_SHARED_SCANS: list[dict[tuple[str, str], DataFrame]] = []


@contextmanager
def shared_scans(spark: SparkSession, sf_dir: str, names: tuple[str, ...]):
    frames = {
        (sf_dir, n): table(spark, sf_dir, n).localCheckpoint(eager=False)
        for n in names
    }
    _SHARED_SCANS.append(frames)
    try:
        yield
    finally:
        _SHARED_SCANS.pop()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    for frames in reversed(_SHARED_SCANS):
        if (sf_dir, name) in frames:
            return frames[(sf_dir, name)]
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
