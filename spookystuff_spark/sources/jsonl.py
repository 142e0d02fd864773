"""JSONL document source with bad-record quarantine.

Real ingest feeds are dirty: truncated lines, invalid UTF-8 escapes, schema
drift. Spark's PERMISSIVE mode + ``columnNameOfCorruptRecord`` keeps the scan
single-pass — good rows parse, bad rows land intact in a quarantine column —
so at 100 TB there is no second "validate" pass over the corpus and nothing
is silently dropped (DROPMALFORMED's failure mode). The quarantine split is
two filters over one cached scan, not two scans.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) from one permissive scan.

    ``good`` has exactly the caller's schema; ``quarantined`` is
    (raw_line string) for replay/repair. A malformed line is never silently
    dropped and never poisons the batch.

    The scan is CACHED (Spark requires it to filter on the corrupt column);
    the cached blocks live until the splits are garbage-collected. Repeated
    ingests in a long-lived session should use :func:`jsonl_ingest`, which
    unpersists deterministically after the splits are materialized.
    """
    good, quarantined, _ = _read_jsonl_cached(spark, path, schema)
    return good, quarantined


@contextmanager
def jsonl_ingest(spark: SparkSession, path: str, schema: StructType):
    """``with jsonl_ingest(...) as (good, quarantined):`` — materialize (write
    out / count) both splits inside the block; the cached scan is unpersisted
    on exit, so repeated ingest loops don't accumulate executor cache blocks."""
    good, quarantined, cached = _read_jsonl_cached(spark, path, schema)
    try:
        yield good, quarantined
    finally:
        cached.unpersist()


def _read_jsonl_cached(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame, DataFrame]:
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires caching before filtering on the corrupt column
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantined, df
