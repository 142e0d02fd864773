"""JSONL document source with bad-record quarantine.

Real ingest feeds are dirty: truncated lines, invalid UTF-8 escapes, schema
drift. Spark's PERMISSIVE mode + ``columnNameOfCorruptRecord`` keeps the scan
single-pass — good rows parse, bad rows land intact in a quarantine column —
so at 100 TB there is no second "validate" pass over the corpus and nothing
is silently dropped (DROPMALFORMED's failure mode). The quarantine split is
two filters over one cached scan, not two scans.
"""

from __future__ import annotations

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
    """
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
    return good, quarantined
