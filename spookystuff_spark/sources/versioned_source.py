"""PySpark-4 Python DataSource over the versioned table (sources/upsert.py):
batch reads with time travel, and a streaming Change-Data-Feed reader.

    spark.dataSource.register(VersionedTableDataSource)

    # batch (current snapshot, or option("version", "v00001") time travel)
    spark.read.format("spooky_versioned").option("path", dir).load()

    # streaming CDC: each committed version's _changes log becomes a
    # micro-batch; offsets are version numbers, so restart-resume is exact
    spark.readStream.format("spooky_versioned").option("path", dir).load()

Scale shape: one InputPartition per parquet data file (the same
task-per-file parallelism a native scan gets), rows shipped as Arrow
RecordBatches — never tuple-at-a-time. The stream reader never diffs
snapshots: it reads the per-version ``_changes`` logs the writers recorded
at commit time (Delta CDF protocol), so a micro-batch costs O(changed
rows), not O(table). Offsets are monotone version numbers; ``commit`` is a
no-op because version dirs are immutable and vacuum-retention is the
caller's contract.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType

from spookystuff_spark.sources import upsert as U

_CHANGES = "_changes"
_KIND = "_kind"  # sidecar: change type for feed files lacking a _change column


@dataclass
class _FilePart(InputPartition):
    path: str
    change: bool  # True: file belongs to a change feed
    kind: str | None = None  # fill for a missing _change column


def _data_files(snapshot_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(snapshot_dir, "*.parquet")))


def _read_arrow(
    path: str,
    names: Sequence[str] | None = None,
    fill: dict | None = None,
):
    """Iterate a parquet file as Arrow RecordBatches, aligned to ``names``
    (Spark's expected column order). An absent column is filled from
    ``fill`` (constant, e.g. ``_change`` from the version's _kind sidecar)
    or with nulls."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for batch in pq.ParquetFile(path).iter_batches():
        if names is None or batch.schema.names == list(names):
            yield batch
            continue
        cols = []
        for n in names:
            if n in batch.schema.names:
                cols.append(batch.column(n))
            elif fill and fill.get(n) is not None:
                cols.append(
                    pa.array([fill[n]] * batch.num_rows, type=pa.string())
                )
            else:
                cols.append(pa.nulls(batch.num_rows, type=pa.string()))
        yield pa.RecordBatch.from_arrays(cols, names=list(names))


class _BatchReader(DataSourceReader):
    def __init__(self, table_dir: str, version: str, names: Sequence[str]):
        self.snapshot = os.path.join(table_dir, version)
        self.names = list(names)

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePart(p, False) for p in _data_files(self.snapshot)]

    def read(self, partition: _FilePart) -> Iterator:
        yield from _read_arrow(partition.path, self.names)


class _ChangeFeedReader(DataSourceStreamReader):
    """Offsets: {"version": int} = highest version whose changes were
    emitted. A micro-batch (start, end] maps to the ``_changes`` files of
    every committed version in that range."""

    def __init__(
        self,
        table_dir: str,
        starting_version: int | None,
        names: Sequence[str],
    ):
        self.table_dir = table_dir
        self.names = list(names)
        if starting_version is not None:
            self.start_v = starting_version
        else:
            cur = U.committed_versions(table_dir)
            self.start_v = int(cur[-1][1:]) if cur else 0

    def initialOffset(self) -> dict:
        return {"version": self.start_v}

    def latestOffset(self) -> dict:
        cur = U.committed_versions(self.table_dir)
        latest = int(cur[-1][1:]) if cur else 0
        return {"version": max(latest, self.start_v)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for v in U.committed_versions(self.table_dir):
            n = int(v[1:])
            if start["version"] < n <= end["version"]:
                feed = os.path.join(self.table_dir, v, _CHANGES)
                kind = None
                kind_path = os.path.join(feed, _KIND)
                if os.path.exists(kind_path):
                    with open(kind_path) as f:
                        kind = f.read().strip() or None
                parts.extend(
                    _FilePart(p, True, kind) for p in _data_files(feed)
                )
        # Spark requires >= 1 partition per batch; an empty range (e.g.
        # compaction-only versions have no _changes) yields a no-row part
        return parts or [_FilePart("", True)]

    def read(self, partition: _FilePart) -> Iterator:
        if partition.path:
            yield from _read_arrow(
                partition.path,
                self.names,
                {"_change": partition.kind} if partition.kind else None,
            )

    def commit(self, end: dict) -> None:
        pass  # version dirs are immutable; retention = vacuum policy

    def stop(self) -> None:
        pass


@dataclass
class _StagedFile(WriterCommitMessage):
    filename: str | None
    num_rows: int


class _VersionedArrowWriter(DataSourceArrowWriter):
    """Two-phase commit writer — the Spark commit protocol made explicit:

    1. Every task streams its Arrow batches into ONE parquet file under a
       private staging dir (unique name; a retried/speculative task stages a
       different file) and returns the filename as its commit message.
    2. Only if ALL tasks succeed does the driver ``commit``: the staged
       files (plus, for append mode, hard links to the previous snapshot's
       immutable data files — metadata-only, no data copy) become the next
       version dir, the change feed records the staged files, and the
       pointer swaps. ``abort`` just deletes staging — a failed job leaves
       the table byte-identical.

    Append here is a blind append (new rows added, no key dedup) — the
    keyed MERGE path stays in upsert.upsert(), which needs a join.
    """

    def __init__(self, table_dir: str, overwrite: bool):
        import uuid

        self.table_dir = table_dir
        self.overwrite = overwrite
        self.staging = os.path.join(table_dir, f"_staging-{uuid.uuid4().hex}")

    def write(self, iterator) -> _StagedFile:
        import uuid

        import pyarrow.parquet as pq

        os.makedirs(self.staging, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.parquet"
        writer = None
        n = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(self.staging, fname), batch.schema
                )
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is None:
            return _StagedFile(None, 0)
        writer.close()
        return _StagedFile(fname, n)

    def _link(self, src: str, dst: str) -> None:
        try:
            os.link(src, dst)
        except OSError:  # cross-device / FS without hard links
            import shutil

            shutil.copy2(src, dst)

    def _commit_files(self, messages, marker: str | None = None) -> None:
        staged = [m.filename for m in messages if m and m.filename]
        v = U._next_version(self.table_dir)
        vdir = os.path.join(self.table_dir, v)
        feed = os.path.join(vdir, _CHANGES)
        os.makedirs(feed, exist_ok=True)
        if not self.overwrite:
            cur = U.committed_versions(self.table_dir)
            if cur:
                prev = os.path.join(self.table_dir, cur[-1])
                for i, p in enumerate(_data_files(prev)):
                    self._link(p, os.path.join(vdir, f"prev-{i:05d}.parquet"))
        for f in staged:
            self._link(os.path.join(self.staging, f), os.path.join(vdir, f))
            self._link(os.path.join(self.staging, f), os.path.join(feed, f))
        with open(os.path.join(feed, _KIND), "w") as fh:
            fh.write("upsert")
        if marker:
            with open(os.path.join(vdir, marker), "w"):
                pass
        with open(os.path.join(vdir, "_SUCCESS"), "w"):
            pass
        U._swap_pointer(self.table_dir, v)
        self._cleanup()  # staging files are linked into vdir now

    def _cleanup(self) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)

    def commit(self, messages) -> None:
        self._commit_files(messages)

    def abort(self, messages) -> None:
        self._cleanup()


class _VersionedStreamArrowWriter(_VersionedArrowWriter, DataSourceStreamArrowWriter):
    """Streaming sink twin: same staged-files two-phase commit, plus
    exactly-once per micro-batch — the version commits with a ``_BATCH_<id>``
    marker (the streaming/sink.py protocol), and a replayed batch id after a
    restart cleans its staging and commits nothing. Always append-mode: each
    micro-batch's rows extend the table; previous snapshot files are linked,
    never rewritten (O(batch) per batch)."""

    def __init__(self, table_dir: str):
        super().__init__(table_dir, overwrite=False)
        # streaming recreates the writer in a separate commit-runner process:
        # a random staging name would diverge between the write tasks and the
        # commit, so the stream writer stages under ONE deterministic dir
        # (safe under the table's single-writer contract; commit links only
        # the files named in this batch's messages and then clears the dir,
        # so stale files from a crashed batch are dropped, not committed)
        self.staging = os.path.join(table_dir, "_staging-stream")

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        from spookystuff_spark.streaming.sink import last_committed_batch

        last = last_committed_batch(self.table_dir)
        if last is not None and batchId <= last:
            self._cleanup()  # replay: already committed, drop staged files
            return
        self._commit_files(messages, marker=f"_BATCH_{batchId}")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        self._cleanup()


class VersionedTableDataSource(DataSource):
    """name: ``spooky_versioned``. Options: ``path`` (table dir, required),
    ``version`` (batch time travel), ``startingVersion`` (stream replay
    start; default = current version, i.e. only future changes)."""

    @classmethod
    def name(cls) -> str:
        return "spooky_versioned"

    def _table_dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("option 'path' is required")
        return path

    def _resolve_version(self) -> str:
        table_dir = self._table_dir()
        v = self.options.get("version")
        committed = U.committed_versions(table_dir)
        if not committed:
            raise FileNotFoundError(f"no committed version in {table_dir}")
        if v is None:
            return committed[-1]
        if v not in committed:
            raise FileNotFoundError(f"version {v} not committed in {table_dir}")
        return v

    def _snapshot_schema(self, with_change: bool) -> StructType:
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        files = _data_files(
            os.path.join(self._table_dir(), self._resolve_version())
        )
        if not files:
            raise FileNotFoundError("empty snapshot")
        schema = from_arrow_schema(pq.read_schema(files[0]))
        if with_change:
            schema = StructType(
                [*schema.fields, StructField("_change", StringType())]
            )
        return schema

    def schema(self) -> StructType:
        # the stream feed carries the extra _change column
        return self._snapshot_schema(with_change=self._is_stream())

    def _is_stream(self) -> bool:
        return str(self.options.get("changefeed", "")).lower() == "true"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(
            self._table_dir(), self._resolve_version(), schema.fieldNames()
        )

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        sv = self.options.get("startingversion")
        return _ChangeFeedReader(
            self._table_dir(),
            int(sv) if sv is not None else None,
            schema.fieldNames(),
        )

    def writer(self, schema: StructType, overwrite: bool) -> _VersionedArrowWriter:
        return _VersionedArrowWriter(self._table_dir(), overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> _VersionedStreamArrowWriter:
        return _VersionedStreamArrowWriter(self._table_dir())
