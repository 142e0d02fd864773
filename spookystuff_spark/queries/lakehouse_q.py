"""Gate-checked lakehouse CDC query: versioned-table upsert → table_diff.

``q_cdc_upsert`` exercises the full write path end-to-end INSIDE the
correctness gate: build a versioned table from the documents corpus, MERGE a
deterministic update batch, and return the CDC between the two snapshots.
The DuckDB oracle states the expected diff closed-form (the update batch is
a pure function of doc_id), so insert/update classification, key matching,
and the changed-column predicate are all value-pinned — not just pytest'd.

Registered ``bench_only``; every row rides ``q_scalar_suite``'s melt.

Scale shape: two snapshot writes (scan-shaped, no shuffle beyond the write)
+ one full-outer key join for the diff — the same plan class as any MERGE.
The result is eagerly localCheckpointed so the temp table dir can be
reclaimed; output is bounded by the changed-row count, never the table.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import bench_only
from spookystuff_spark.tables import table

ORACLE_CDC = """
    SELECT doc_id + 1000000 AS doc_id, lang, source, n_chars,
           'insert' AS _change
    FROM documents WHERE doc_id % 97 = 0
    UNION ALL
    SELECT doc_id, lang, source, n_chars + 1, 'update'
    FROM documents WHERE doc_id % 7 = 0
"""


@bench_only("q_cdc_upsert")
def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spookystuff_spark.sources.upsert import frame_diff, read_table, upsert, write_table
    from spookystuff_spark.sources.versioned_source import VersionedTableDataSource

    base = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    updates = base.where(F.col("doc_id") % 7 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1
    )
    inserts = base.where(F.col("doc_id") % 97 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    tdir = tempfile.mkdtemp(prefix="spooky-cdc-")
    try:
        v1 = write_table(base, tdir, change_feed=False)
        v2 = upsert(
            spark,
            tdir,
            updates.unionByName(inserts),
            ["doc_id"],
            change_feed=False,
        )
        # the FROM side time-travels through the Python DataSource reader
        # (option version=v1) so the DataSource batch + time-travel path is
        # value-pinned inside the gate, not just pytest'd; the TO side stays
        # a native manifest scan — both readers must agree for the oracle's
        # closed-form diff to come out right
        try:
            spark.dataSource.register(VersionedTableDataSource)
        except Exception:
            pass  # already registered in this session
        old = (
            spark.read.format("spooky_versioned")
            .option("path", tdir)
            .option("version", v1)
            .load()
        )
        new = read_table(spark, tdir, v2)
        diff = frame_diff(old, new, key_cols=["doc_id"])
        # eager checkpoint: the diff must outlive the temp table dir
        return diff.select(
            "doc_id", "lang", "source", "n_chars", "_change"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
