"""Versioned parquet table with MERGE-style upsert — lakehouse-lite.

Plain parquet directories can't be updated in place; the standard fix
(Delta/Iceberg's core idea) is versioned immutable snapshots + an atomic
pointer swap. This is that protocol, minimal and dependency-free:

    <dir>/v00001/part-*.parquet     immutable snapshot
    <dir>/v00002/...
    <dir>/_LATEST                   one line: the current version name

A writer materializes the next full snapshot (old rows anti-joined against
the update keys, unioned with updates), then atomically replaces ``_LATEST``
(os.replace — atomic on POSIX; on HDFS/object stores the same single-object
swap applies). Readers resolve the pointer then read one immutable directory
— never a half-written one. Crash mid-write leaves a dangling version dir
(cleaned by ``vacuum``) and an untouched pointer.

Single-writer optimistic semantics (reference scope: the doc cache's
compaction story in sources/doc_cache_source.py, generalized to any keyed
table). ``compact`` rewrites the snapshot into a target file count —
at 100 TB, snapshotting rewrites only what changed if you partition the
table and upsert per partition.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"


def _latest(table_dir: str) -> str | None:
    p = os.path.join(table_dir, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        v = f.read().strip()
    return v or None


def _swap_pointer(table_dir: str, version: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._latest-")
    with os.fdopen(fd, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(table_dir, _POINTER))  # atomic commit


def _next_version(table_dir: str) -> str:
    """Next unoccupied version name. Derived from BOTH the pointer and the
    existing version dirs: a crashed writer leaves a dangling dir at
    pointer+1, and deriving from the pointer alone would make every later
    write collide with it (errorifexists) until a manual vacuum — the table
    must self-heal by skipping past dangling dirs instead."""
    cur = _latest(table_dir)
    highest = int(cur[1:]) if cur else 0
    if os.path.isdir(table_dir):
        for v in versions(table_dir):
            highest = max(highest, int(v[1:]))
    return f"v{highest + 1:05d}"


_CHANGES = "_changes"


def _commit(table_dir: str, version: str, marker: str | None) -> None:
    """Drop an optional marker file inside the (already fully written)
    immutable version dir, then swap the pointer. The marker rides the same
    atomic commit as the data: a crash before the swap leaves a dangling,
    never-read dir; after it, marker and snapshot are visible together —
    the hook streaming/sink.py uses for exactly-once batch idempotence."""
    if marker:
        with open(os.path.join(table_dir, version, marker), "w"):
            pass
    _swap_pointer(table_dir, version)


def _write_change_feed(df: DataFrame, table_dir: str, version: str, kind: str) -> None:
    """Record this commit's change set under ``<version>/_changes`` (the
    Delta Change-Data-Feed idea): the rows are ALREADY known at commit time,
    so downstream CDC consumers (sources/versioned_source.py's streaming
    reader) read a tiny per-version log instead of diffing two full
    snapshots — the property that keeps table→stream incremental at 100 TB.
    Underscore-prefixed paths are invisible to snapshot scans (Hadoop's
    hidden-file convention), so time travel and reads are unaffected."""
    import pyspark.sql.functions as F

    df.withColumn("_change", F.lit(kind)).write.mode("errorifexists").parquet(
        os.path.join(table_dir, version, _CHANGES)
    )


def read_table(
    spark: SparkSession, table_dir: str, version: str | None = None
) -> DataFrame:
    """Read the current snapshot, or time-travel to an earlier committed
    ``version`` (any complete dir ≤ the pointer that vacuum hasn't dropped)."""
    cur = _latest(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    v = version or cur
    if v not in committed_versions(table_dir):
        raise FileNotFoundError(f"version {v} not committed in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, v))


def write_table(
    df: DataFrame,
    table_dir: str,
    marker: str | None = None,
    change_feed: bool = True,
) -> str:
    """Create/replace the table with a fresh snapshot. Returns the version."""
    os.makedirs(table_dir, exist_ok=True)
    v = _next_version(table_dir)
    df.write.mode("errorifexists").parquet(os.path.join(table_dir, v))
    if change_feed:
        _write_change_feed(
            df.sparkSession.read.parquet(os.path.join(table_dir, v)),
            table_dir,
            v,
            "upsert",
        )
    _commit(table_dir, v, marker)
    return v


def upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    marker: str | None = None,
    change_feed: bool = True,
) -> str:
    """MERGE: rows matching an update key are replaced, others kept, new keys
    inserted. One anti-join (update keys broadcast when small) + one union;
    the new snapshot commits with a pointer swap. Returns the version."""
    cur_v = _latest(table_dir)
    if cur_v is None:
        return write_table(updates, table_dir, marker, change_feed)
    current = spark.read.parquet(os.path.join(table_dir, cur_v))
    keys = updates.select(*key_cols).distinct()
    kept = current.join(keys, list(key_cols), "left_anti")
    # schema evolution (additive, both directions): a column present on only
    # one side materializes as NULL on the other — the new snapshot's schema
    # is the union, old snapshots keep theirs (time travel is schema travel)
    merged = kept.unionByName(updates, allowMissingColumns=True)
    v = _next_version(table_dir)
    merged.write.mode("errorifexists").parquet(os.path.join(table_dir, v))
    if change_feed:
        # the change set IS the updates frame — re-read it from the freshly
        # written snapshot (semi-join on the update keys) so the feed write
        # doesn't recompute the caller's arbitrary lineage
        snap = spark.read.parquet(os.path.join(table_dir, v))
        _write_change_feed(
            snap.join(keys, list(key_cols), "leftsemi"), table_dir, v, "upsert"
        )
    _commit(table_dir, v, marker)
    return v


def append_rows(
    spark: SparkSession,
    table_dir: str,
    rows: DataFrame,
    marker: str | None = None,
) -> str:
    """Blind append as a METADATA-ONLY commit: only ``rows`` are written;
    the previous snapshot's immutable data files are hard-linked into the
    new version dir (copy fallback off-POSIX). An append-heavy table (e.g.
    a streaming dedup state) therefore costs O(batch) per commit, not
    O(table) — the snapshot-rewrite cost stays reserved for keyed upserts,
    which actually change old rows."""
    os.makedirs(table_dir, exist_ok=True)
    cur = _latest(table_dir)
    v = _next_version(table_dir)
    vdir = os.path.join(table_dir, v)
    rows.write.mode("errorifexists").parquet(vdir)
    if cur is not None:
        prev = os.path.join(table_dir, cur)
        files = sorted(
            e.name
            for e in os.scandir(prev)
            if e.name.endswith(".parquet") and e.is_file()
        )
        import hashlib

        for i, name in enumerate(files):
            # fixed-width link names (NOT prev- + old name: chained appends
            # would grow the filename with every version)
            tag = hashlib.md5(name.encode()).hexdigest()[:8]
            dst = os.path.join(vdir, f"prev-{i:05d}-{tag}.parquet")
            try:
                os.link(os.path.join(prev, name), dst)
            except OSError:
                shutil.copy2(os.path.join(prev, name), dst)
    _commit(table_dir, v, marker)
    return v


def clone_table(src_dir: str, dst_dir: str) -> str:
    """Zero-copy (shallow) clone: hard-link the current snapshot's data
    files into a fresh single-version table — the dev/test-sandbox idiom
    that at 100 TB must be metadata-only, never a data copy. The clone is
    fully independent afterwards (its own pointer, its own future
    versions); the shared files are immutable by protocol, so neither side
    can corrupt the other."""
    cur = _latest(src_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed version in {src_dir}")
    os.makedirs(dst_dir, exist_ok=True)
    v = _next_version(dst_dir)
    vdir = os.path.join(dst_dir, v)
    os.makedirs(vdir)
    src_snap = os.path.join(src_dir, cur)
    for e in sorted(os.scandir(src_snap), key=lambda e: e.name):
        if not (e.is_file() and e.name.endswith(".parquet")):
            continue
        try:
            os.link(e.path, os.path.join(vdir, e.name))
        except OSError:
            shutil.copy2(e.path, os.path.join(vdir, e.name))
    with open(os.path.join(vdir, "_SUCCESS"), "w"):
        pass
    _swap_pointer(dst_dir, v)
    return v


def delete_where(
    spark: SparkSession, table_dir: str, condition, change_feed: bool = True
) -> str:
    """Anti-delete: new snapshot without rows matching ``condition``."""
    current = read_table(spark, table_dir)
    v = _next_version(table_dir)
    current.where(~condition).write.mode("errorifexists").parquet(
        os.path.join(table_dir, v)
    )
    if change_feed:
        # deleted rows come from the (immutable) PREVIOUS snapshot scan
        _write_change_feed(current.where(condition), table_dir, v, "delete")
    _swap_pointer(table_dir, v)
    return v


def compact(spark: SparkSession, table_dir: str, num_files: int = 8) -> str:
    """Rewrite the current snapshot into ``num_files`` files (small-file
    compaction; same pointer-swap commit)."""
    current = read_table(spark, table_dir)
    v = _next_version(table_dir)
    current.repartition(num_files).write.mode("errorifexists").parquet(
        os.path.join(table_dir, v)
    )
    _swap_pointer(table_dir, v)
    return v


def snapshot_file_stats(table_dir: str, version: str | None = None) -> dict:
    """{n_files, total_bytes, min_bytes, max_bytes} of a snapshot's data
    files — the observability half of compaction: many small files means
    task-per-file scheduling overhead and poor scan locality; a few huge
    ones means no parallelism. (Local/POSIX listing; on a real DFS the same
    numbers come from one ``FileSystem.listStatus`` call.)"""
    v = version or _latest(table_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    sizes = [
        e.stat().st_size
        for e in os.scandir(os.path.join(table_dir, v))
        if e.name.endswith(".parquet") and e.is_file()
    ]
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes, default=0),
        "max_bytes": max(sizes, default=0),
    }


def compact_auto(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    threshold: float = 0.5,
) -> str | None:
    """Size-aware compaction (the OPTIMIZE of a real lakehouse): measure the
    current snapshot's file-size distribution, and iff the MEDIAN data file
    is under ``threshold × target`` rewrite into ``ceil(total / target)``
    files. Returns the new version, or None when the layout is already
    healthy — callers loop this after streaming upserts (each micro-batch
    snapshot writes shuffle-partition-many small files) without paying a
    rewrite when nothing needs one.

    128 MB default target ≈ one HDFS block / one comfortable scan task; at
    100 TB that's ~800k files, each a single task with locality."""
    stats = snapshot_file_stats(table_dir)
    if stats["n_files"] == 0:
        return None
    sizes = sorted(
        e.stat().st_size
        for e in os.scandir(os.path.join(table_dir, _latest(table_dir)))
        if e.name.endswith(".parquet") and e.is_file()
    )
    median = sizes[len(sizes) // 2]
    if stats["n_files"] > 1 and median < threshold * target_file_bytes:
        n = max(1, -(-stats["total_bytes"] // target_file_bytes))
        return compact(spark, table_dir, num_files=int(n))
    return None


def versions(table_dir: str) -> list[str]:
    return sorted(
        d for d in os.listdir(table_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def committed_versions(table_dir: str) -> list[str]:
    """Versions safe to read: at or below the pointer AND completely written
    (Spark's ``_SUCCESS`` marker — a crashed writer's dir lacks it). Since
    ``_next_version`` self-heals by leapfrogging dangling dirs, a crashed dir
    can sit BELOW the pointer; the marker check keeps it out of time travel."""
    cur = _latest(table_dir)
    if cur is None:
        return []
    return [
        v
        for v in versions(table_dir)
        if v <= cur and os.path.exists(os.path.join(table_dir, v, "_SUCCESS"))
    ]


def vacuum(table_dir: str, keep: int = 2) -> list[str]:
    """Drop all but the newest ``keep`` committed versions (never the current
    one). Also removes dangling dirs from crashed writers — above OR below
    the pointer (the latter exist because ``_next_version`` leapfrogs them).
    Returns removed version names."""
    cur = _latest(table_dir)
    vs = versions(table_dir)
    committed = committed_versions(table_dir)
    dangling = [v for v in vs if v not in committed]
    drop = committed[:-keep] if keep > 0 else committed[:-1]
    removed = []
    for v in drop + dangling:
        if v == cur:
            continue
        shutil.rmtree(os.path.join(table_dir, v))
        removed.append(v)
    # stale writer staging dirs: an aborted DataSource write removes its
    # staging, but an in-flight task can recreate the dir after the driver's
    # abort — harmless (underscore paths are invisible to readers) and swept
    # here under the table's single-writer contract
    for d in os.listdir(table_dir):
        if d.startswith("_staging-"):
            shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)
            removed.append(d)
    return removed


def table_diff(
    spark: SparkSession,
    table_dir: str,
    from_version: str,
    to_version: str | None = None,
    key_cols: Sequence[str] | None = None,
) -> DataFrame:
    """CDC between two committed snapshots → the newer-version rows tagged
    ``_change ∈ {insert, update, delete}``.

    With ``key_cols``: a key present only in ``to`` is an insert, only in
    ``from`` a delete (the OLD row is returned for deletes), present in both
    with any non-key column changed an update (unchanged rows are omitted).
    Without ``key_cols`` the diff is set-based (exceptAll both ways):
    appeared rows are inserts, vanished rows deletes.

    Plan shape: one full-outer join on the key (or two exceptAll
    aggregations) between two immutable parquet snapshots — column-pruned
    and partition-prunable like any other scan; nothing is collected. The
    standard lakehouse "what changed since v?" primitive for incremental
    downstream pipelines.
    """
    import pyspark.sql.functions as F

    newer = to_version or _latest(table_dir)
    a = read_table(spark, table_dir, from_version)
    b = read_table(spark, table_dir, newer)
    if key_cols is None:
        ins = b.exceptAll(a).withColumn("_change", F.lit("insert"))
        dels = a.exceptAll(b).withColumn("_change", F.lit("delete"))
        return ins.unionByName(dels)

    val_cols = [c for c in b.columns if c not in key_cols]
    oa = a.select(
        *key_cols, F.struct(*val_cols).alias("_old")
    )
    ob = b.select(
        *key_cols, F.struct(*val_cols).alias("_new")
    )
    j = oa.join(ob, list(key_cols), "full_outer")
    change = (
        F.when(F.col("_old").isNull(), "insert")
        .when(F.col("_new").isNull(), "delete")
        .when(F.col("_old") != F.col("_new"), "update")
    )
    side = F.coalesce(F.col("_new"), F.col("_old"))
    return (
        j.withColumn("_change", change)
        .where(F.col("_change").isNotNull())
        .select(
            *key_cols,
            *[side[c].alias(c) for c in val_cols],
            "_change",
        )
    )
