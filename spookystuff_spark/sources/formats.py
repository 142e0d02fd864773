"""Multi-format batch IO: one read/write surface over parquet, ORC, CSV,
JSON(-lines), and text — the Spark-native formats a corpus actually arrives
in before it is normalized to parquet.

Parity note: the reference ingests arbitrary fetched content via Tika
content-type detection (`module/core/.../doc/Doc.scala:70-144`) and leaves
tabular formats to Spark; the rebuild's structured-side equivalent is this
module (plus sources/jsonl.py's quarantine ingest for corrupt records and
sources/warc.py for archive crawls).

Scale notes per format:

* parquet/ORC — columnar, splittable, predicate + projection pushdown;
  the only formats that belong UNDER a 100 TB table. ORC pushes the same
  min/max + Bloom row-group skipping as parquet through the DataSource V1
  scan, so reads stay `PushedFilters`-visible.
* CSV/JSON — row-oriented ingest formats: splittable only uncompressed (a
  .gz file = one task — repartition after read), schema supplied explicitly
  here (inference = an extra full scan at 100 TB, and a correctness hazard).
  PERMISSIVE + ``columnNameOfCorruptRecord`` quarantines bad rows instead
  of failing the job (same protocol as sources/jsonl.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CORRUPT = "_corrupt_record"


def write_format(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_cols: Sequence[str] = (),
    compression: str | None = None,
) -> None:
    """Write ``df`` as ``fmt`` ∈ {parquet, orc, csv, json, text}."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_format(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read ``path`` as ``fmt``. For CSV/JSON a ``schema`` is required — at
    scale, inference is a full extra pass; everywhere, it is a drifting
    contract. Corrupt CSV/JSON rows land in ``_corrupt_record`` (PERMISSIVE)
    instead of killing the job; filter or quarantine them downstream."""
    r = spark.read
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        if isinstance(schema, str):
            schema = f"{schema}, {_CORRUPT} string"
        else:
            from pyspark.sql.types import StringType, StructField

            schema = StructType(
                [*schema.fields, StructField(_CORRUPT, StringType())]
            )
        r = (
            r.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
        )
        if fmt == "csv":
            r = r.option("header", "true")
    elif schema is not None:
        r = r.schema(schema)
    return r.format(fmt).load(path)


def convert(
    spark: SparkSession,
    src_path: str,
    src_fmt: str,
    dst_path: str,
    dst_fmt: str = "parquet",
    schema: StructType | str | None = None,
    partition_cols: Sequence[str] = (),
) -> int:
    """Normalize an ingest format into an analytic one (the landing-zone →
    lakehouse hop). Corrupt ingest rows are dropped (count returned is GOOD
    rows); one pass, no driver materialization."""
    df = read_format(spark, src_path, src_fmt, schema)
    cached = None
    if _CORRUPT in df.columns:
        # Spark refuses to filter on _corrupt_record from the raw scan
        # (the internal row drops it when unreferenced); caching pins the
        # parsed row first — same protocol as sources/jsonl.py
        cached = df.cache()
        df = cached.where(cached[_CORRUPT].isNull()).drop(_CORRUPT)
    try:
        write_format(df, dst_path, dst_fmt, partition_cols=partition_cols)
    finally:
        if cached is not None:
            cached.unpersist()
    return spark.read.format(dst_fmt).load(dst_path).count()
