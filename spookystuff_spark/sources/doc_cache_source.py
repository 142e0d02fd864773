"""The DFS doc cache as a queryable DataFrame source — audit/analytics over
everything the agents ever fetched (ref: the auditing paths of
conf/SpookyConf.scala:38-50; the reference has no query surface over its cache,
this is rebuild-native).

Reads the ``{root}/{shard}/{key}/{ts}.json.gz`` layout written by
caching/dfs.py in one distributed pass (driver lists, executors parse per
partition). All IO goes through fsio (pyarrow.fs), so the cache root may be
local, HDFS or an object store — executors re-resolve the filesystem from
the path URI, the cluster-correct pattern. Scale path: the same data as a
Delta/parquet doc table; this reader exists so local/DFS cache dirs are
directly explorable without a migration.
"""

from __future__ import annotations

import gzip
import json
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spookystuff_spark import fsio

CACHE_ENTRY_SCHEMA = StructType(
    [
        StructField("trace_key", StringType()),
        StructField("fetch_ts_ms", LongType()),
        StructField("uri", StringType()),
        StructField("name", StringType()),
        StructField("mime", StringType()),
        StructField("status", IntegerType()),
        StructField("success", BooleanType()),
        StructField("n_bytes", LongType()),
        StructField("error", StringType()),
        StructField("path", StringType()),
    ]
)


def _cache_files(root: str, latest_only: bool) -> list[str]:
    paths: list[str] = []
    for shard in fsio.ls(root):
        shard_dir = fsio.join(root, shard)
        if not fsio.is_dir(shard_dir):
            continue
        for key in fsio.ls(shard_dir):
            key_dir = fsio.join(shard_dir, key)
            files = [f for f in fsio.ls(key_dir) if f.endswith(".json.gz")]
            if latest_only and files:
                files = [max(files, key=lambda f: int(f.split(".")[0]))]
            paths.extend(fsio.join(key_dir, f) for f in files)
    return paths


def _parse_cache_file(p: str) -> tuple[str, int, list] | None:
    key = fsio.basename(fsio.parent(p))
    ts = int(fsio.basename(p).split(".")[0])
    try:
        entries = json.loads(gzip.decompress(fsio.read_bytes(p)))
    except (OSError, ValueError):
        return None
    return key, ts, entries


def read_doc_cache(
    spark: SparkSession, root: str, latest_only: bool = False
) -> DataFrame:
    """One row per cached observation (payload sizes, not payloads)."""
    paths = _cache_files(root, latest_only)
    if not paths:
        return spark.createDataFrame([], CACHE_ENTRY_SCHEMA)

    def parse(it: Iterator[str]) -> Iterator[tuple]:
        for p in it:
            got = _parse_cache_file(p)
            if got is None:
                continue
            key, ts, entries = got
            for d in entries:
                content = d.get("content")
                yield (
                    key,
                    ts,
                    d.get("uri"),
                    d.get("name"),
                    d.get("mime"),
                    d.get("status"),
                    bool(d.get("success")),
                    len(content) // 2 if content else 0,  # hex-encoded
                    d.get("error"),
                    p,
                )

    rdd = spark.sparkContext.parallelize(
        paths, max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    ).mapPartitions(parse)
    return spark.createDataFrame(rdd, CACHE_ENTRY_SCHEMA)


def compact_doc_cache(
    spark: SparkSession,
    root: str,
    table_dir: str,
    include_content: bool = True,
    latest_only: bool = True,
) -> DataFrame:
    """Compact the file-per-fetch DFS cache into a partitioned parquet doc
    table — the 100 TB scale path: millions of small json.gz files become a
    columnar table partitioned by key shard, queryable/joinable at full
    parallelism and friendly to object stores.

    Returns the compacted DataFrame (also written to ``table_dir``).
    """
    from pyspark.sql.types import BinaryType

    paths = _cache_files(root, latest_only)

    schema = StructType(
        list(CACHE_ENTRY_SCHEMA.fields)
        + ([StructField("content", BinaryType())] if include_content else [])
        + [StructField("shard", StringType())]
    )

    def parse(it: Iterator[str]) -> Iterator[tuple]:
        for p in it:
            got = _parse_cache_file(p)
            if got is None:
                continue
            key, ts, entries = got
            for d in entries:
                content_hex = d.get("content")
                base = (
                    key,
                    ts,
                    d.get("uri"),
                    d.get("name"),
                    d.get("mime"),
                    d.get("status"),
                    bool(d.get("success")),
                    len(content_hex) // 2 if content_hex else 0,
                    d.get("error"),
                    p,
                )
                if include_content:
                    base = base + (
                        bytes.fromhex(content_hex) if content_hex else None,
                    )
                yield base + (key[:2],)

    if not paths:
        return spark.createDataFrame([], schema)
    rdd = spark.sparkContext.parallelize(
        paths, max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    ).mapPartitions(parse)
    df = spark.createDataFrame(rdd, schema)
    df.write.mode("overwrite").partitionBy("shard").parquet(table_dir)
    return spark.read.parquet(table_dir)
