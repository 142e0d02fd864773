"""One-call table maintenance — the ``OPTIMIZE`` + ``VACUUM`` story.

A long-lived versioned table accretes four kinds of debt, each with its
own primitive in this package: small files from append/MERGE commits
(``compact_auto`` / ``compact_auto_partitioned``), deletion-vector files
from merge-on-read deletes (``compact_dv``; a data compaction materializes
them entirely), unindexed fresh files (``attach_stats`` /
``attach_blooms``), and dead versions (``vacuum``). :func:`optimize`
composes them in the right order with the right skip conditions, so a
scheduled maintenance job is one call — the operational shape Delta users
expect from ``OPTIMIZE table; VACUUM table`` — and every step is
individually a no-op when the table is already healthy (measured from
manifests alone, zero data IO for the checks).

Order matters and is encoded here once:

1. data compaction first (when fragmented) — it MATERIALIZES accumulated
   deletion vectors and schema maps as a side effect, making step 2
   unnecessary in that case;
2. otherwise fold multi-file deletion vectors (``compact_dv``) — keeps
   the per-read anti-join probe one small file without a data rewrite;
3. re-index the rewrite (stats/blooms) when a compaction produced new
   files — carried entries keep the indexes their own commits recorded;
4. vacuum last, with a retention window, so time travel and in-flight
   readers survive aggressive maintenance.

Scale shape: every decision reads manifests only; the expensive steps run
iff their manifest-level trigger fires. At 100 TB the common call is a
cheap no-op heartbeat.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import SparkSession

from spookystuff_spark.sources import upsert as U


def optimize(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    threshold: float = 0.5,
    max_files_per_partition: int = 8,
    stats_cols: Sequence[str] | None = None,
    bloom_cols: Sequence[str] | None = None,
    zorder_by: Sequence[str] | None = None,
    keep: int = 10,
    retain_ms: Optional[int] = None,
    vacuum_table: bool = True,
) -> dict:
    """Run the full maintenance pass; returns an action report::

        {"compacted": version | None,     # data rewrite (if fragmented)
         "dv_folded": version | None,     # vector-only fold (if needed)
         "stats_attached": n | None,      # files profiled post-rewrite
         "blooms_attached": n | None,     # (file, col) blooms post-rewrite
         "vacuumed": [versions removed]}

    Partitioned tables compact through ``compact_auto_partitioned``
    (layout-preserving, manifest-only fragmentation check against
    ``max_files_per_partition``); plain tables through ``compact_auto``
    (median-file-size check against ``threshold × target_file_bytes``).
    ``zorder_by`` clusters the rewrite when one happens. ``stats_cols`` /
    ``bloom_cols`` re-index ONLY a rewrite's own files — no-ops when
    nothing was rewritten (carried entries keep their own commits'
    indexes, resolved chain-wise). ``retain_ms`` is the vacuum retention
    guard (versions newer than it survive regardless of ``keep``)."""
    cur = U._latest(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    raw = U._read_manifest_raw(table_dir, cur) or {}
    pcol = raw.get("partition_col")

    report: dict = {
        "compacted": None,
        "dv_folded": None,
        "stats_attached": None,
        "blooms_attached": None,
        "vacuumed": [],
    }

    if pcol is not None:
        from spookystuff_spark.sources.partitioned_table import (
            compact_auto_partitioned,
        )

        report["compacted"] = compact_auto_partitioned(
            spark,
            table_dir,
            pcol,
            max_files_per_partition=max_files_per_partition,
            stats_cols=stats_cols,
            zorder_by=zorder_by,
        )
    else:
        report["compacted"] = U.compact_auto(
            spark, table_dir,
            target_file_bytes=target_file_bytes,
            threshold=threshold,
            zorder_by=zorder_by,
        )

    if report["compacted"] is None:
        # no data rewrite happened → vectors (if stacked) still need the
        # cheap metadata-only fold; a rewrite would have materialized them
        report["dv_folded"] = U.compact_dv(spark, table_dir)
    if report["compacted"] is not None:
        if stats_cols and pcol is None:
            # partitioned path attached stats inside its commit already
            report["stats_attached"] = U.attach_stats(table_dir, stats_cols)
        if bloom_cols:
            from spookystuff_spark.sources.bloom_index import attach_blooms

            report["blooms_attached"] = attach_blooms(
                spark, table_dir, bloom_cols
            )
    if vacuum_table:
        report["vacuumed"] = U.vacuum(
            table_dir, keep=keep, retain_ms=retain_ms
        )
    return report
