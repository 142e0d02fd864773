"""Per-file bloom-filter index for point lookups on arbitrary columns
(the Delta bloom-filter-index idea, manifest-native).

Min/max stats (``upsert.attach_stats``) only skip files when the column
is clustered — on a shuffled column every file's [min, max] spans the
domain and nothing prunes. A bloom per (file, column) answers "is value
v DEFINITELY absent from this file?" regardless of layout, which is what
a 100 TB point lookup (`WHERE user_id = X`) needs when the table is laid
out by something else.

Build shape: one Arrow-vectorized pass — the two base hashes are JVM
expressions (``xxhash64``, ``crc32``), the k bit positions and the OR-fold
into the bit array are numpy inside one ``applyInPandas`` keyed by file
(one shuffle), and the driver writes one small sidecar per file under
``<version>/_bloom/`` (collected bytes are O(files × bloom size) — the
same driver-side footprint Delta's index writer accepts). The manifest
records {entry: {col: {m, k, path}}} in the version that built it;
readers resolve chain-wise exactly like ``entry_stats`` — an inherited
entry's bloom lives in the manifest of the version that attached it.

Probe shape: the probed value's base hashes come from the SAME JVM
expressions (one 1-row job — no Python reimplementation of xxhash64 to
drift), the driver tests k bits per candidate sidecar (tiny reads), and
only maybe-present files reach the scan. Files without a usable bloom —
never attached, or the sidecar was vacuumed away with its version's
metadata — scan conservatively; deletion vectors apply like every other
reader; the residual equality filter applies either way, so a bloom
false positive costs IO, never correctness.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark import fsio
from spookystuff_spark.sources import upsert as U

_BLOOMS = "blooms"
_DIR = "_bloom"


def _base_hash_cols(col: str):
    """(h1, h2) as JVM expressions — h2 forced odd so the double-hash
    stride is coprime with any power-of-two m."""
    h1 = F.xxhash64(F.col(col).cast("string")).cast("long")
    h2 = (F.crc32(F.col(col).cast("string")).cast("long") * 2 + 1).cast("long")
    return h1, h2


def _positions(h1: int, h2: int, m: int, k: int) -> np.ndarray:
    a = np.uint64(np.int64(h1))
    b = np.uint64(np.int64(h2))
    i = np.arange(k, dtype=np.uint64)
    return ((a + i * b) % np.uint64(m)).astype(np.int64)


def _params(n: int, fpp: float) -> tuple[int, int]:
    n = max(1, n)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def attach_blooms(
    spark: SparkSession,
    table_dir: str,
    cols: Sequence[str],
    fpp: float = 0.01,
) -> int:
    """Build blooms for the CURRENT version's OWN files (inherited entries
    keep the blooms their own version attached — resolve chain-wise via
    :func:`entry_blooms`) and record them in the manifest. Returns the
    number of (file, col) blooms written. Run at commit / OPTIMIZE time,
    like ``attach_stats``."""
    import pandas as pd

    cur = U._latest(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    m = U.read_manifest(table_dir, cur)
    if m is None:
        raise FileNotFoundError(f"{cur} has no manifest")
    if m.get("renames"):
        raise ValueError(
            f"{table_dir}: column renames outstanding — the files carry "
            "physical names; compact() first, then attach blooms"
        )
    own = [e for e in m["files"] if e.startswith(f"{cur}/")]
    if not own:
        return 0
    full = [fsio.join(table_dir, e) for e in own]
    by_path = {f: e for f, e in zip(full, own)}
    df = spark.read.parquet(*full)
    recorded: dict = m.get(_BLOOMS) or {}
    bloom_dir = fsio.join(table_dir, cur, _DIR)
    fsio.mkdirs(bloom_dir)
    n_written = 0
    for ci, col in enumerate(cols):
        h1, h2 = _base_hash_cols(col)
        hashed = df.select(
            F.input_file_name().alias("_file"),
            h1.alias("_h1"),
            h2.alias("_h2"),
        )

        def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
            n = len(pdf)
            mm, kk = _params(n, fpp)
            bits = np.zeros(mm // 8, dtype=np.uint8)
            a = pdf["_h1"].to_numpy(dtype=np.int64).view(np.uint64)
            b = pdf["_h2"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(kk):
                pos = (a + np.uint64(i) * b) % np.uint64(mm)
                pos = pos.astype(np.int64)
                np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
            return pd.DataFrame(
                {
                    "_file": [pdf["_file"].iloc[0]],
                    "m": [mm],
                    "k": [kk],
                    "bloom": [bits.tobytes()],
                }
            )

        built = hashed.groupBy("_file").applyInPandas(
            fold, "_file string, m long, k long, bloom binary"
        ).collect()
        for j, r in enumerate(built):
            # input_file_name returns a URI; match on the path suffix
            entry = next(
                e for f, e in by_path.items() if r["_file"].endswith(f)
            )
            name = f"{_DIR}/c{ci}-{j}.bloom"
            fsio.write_bytes(fsio.join(table_dir, cur, name), bytes(r["bloom"]))
            recorded.setdefault(entry, {})[col] = {
                "m": int(r["m"]),
                "k": int(r["k"]),
                "path": f"{cur}/{name}",
            }
            n_written += 1
    m[_BLOOMS] = recorded
    import json

    fsio.write_bytes(
        fsio.join(table_dir, cur, U._MANIFEST),
        json.dumps(m, separators=(",", ":")).encode(),
    )
    return n_written


def entry_blooms(table_dir: str, version: str) -> dict:
    """Blooms for EVERY entry of a snapshot, resolved chain-wise (the
    ``entry_stats`` idiom): {entry: {col: {m, k, path}}}, {} when never
    attached."""
    m = U.read_manifest(table_dir, version)
    if m is None:
        return {}
    out: dict = {}
    cache: dict = {version: m}
    for e in m["files"]:
        if U._is_abs_entry(e):
            out[e] = {}
            continue
        owner = e.split("/", 1)[0]
        if owner not in cache:
            cache[owner] = U.read_manifest(table_dir, owner) or {}
        out[e] = (cache[owner].get(_BLOOMS) or {}).get(e) or {}
    return out


def _maybe_contains(table_dir: str, spec: dict, h1: int, h2: int) -> bool:
    try:
        raw = fsio.read_bytes(fsio.join(table_dir, spec["path"]))
    except (FileNotFoundError, OSError):
        return True  # sidecar vacuumed away — scan conservatively
    bits = np.frombuffer(raw, dtype=np.uint8)
    if len(bits) * 8 != spec["m"]:
        return True
    pos = _positions(h1, h2, spec["m"], spec["k"])
    return bool(np.all(bits[pos // 8] & (1 << (pos % 8).astype(np.uint8))))


def read_table_point(
    spark: SparkSession,
    table_dir: str,
    col: str,
    value,
    version: str | None = None,
) -> tuple[DataFrame, dict]:
    """Point lookup ``col == value`` scanning only files whose bloom says
    maybe-present. Returns (frame, {"scanned": n, "skipped_bloom": s}).
    The residual equality filter and deletion vectors apply regardless, so
    pruning can only save IO, never change the answer."""
    import json

    from pyspark.sql.types import StructType

    cur = U._latest(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    v = version or cur
    if v not in U.committed_versions(table_dir):
        raise FileNotFoundError(f"version {v} not committed in {table_dir}")
    h1, h2 = _base_hash_cols(col)
    probe = (
        spark.createDataFrame([(value,)], f"`{col}` string")
        if isinstance(value, str)
        else spark.createDataFrame([(value,)], ["_v"]).selectExpr(
            f"_v as {col}"
        )
    )
    hr = probe.select(h1.alias("h1"), h2.alias("h2")).first()
    blooms = entry_blooms(table_dir, v)
    manifest = U.read_manifest(table_dir, v) or {"files": []}
    renames = manifest.get("renames") or {}
    # bloom specs are recorded under the attach-time (physical) name
    phys_col = U.physical_name(table_dir, v, col)
    keep, skipped = [], 0
    for e, full in zip(manifest["files"], U.snapshot_files(table_dir, v)):
        spec = (blooms.get(e) or {}).get(phys_col)
        if spec and not _maybe_contains(table_dir, spec, hr["h1"], hr["h2"]):
            skipped += 1
            continue
        keep.append(full)
    schema_json = U.snapshot_schema_json(table_dir, v)
    if schema_json:
        schema = StructType.fromJson(json.loads(schema_json))
        df = (
            spark.createDataFrame([], schema)
            if not keep
            else U._to_logical(
                spark.read.schema(U._scan_schema(schema, renames)).parquet(
                    *keep
                ),
                renames,
            )
        )
    else:
        if not keep:
            raise FileNotFoundError(f"no candidate files in {table_dir}")
        df = spark.read.parquet(*keep)
    df = U._apply_deletion_vectors(spark, table_dir, v, df)
    return (
        df.where(F.col(col) == F.lit(value)),
        {"scanned": len(keep), "skipped_bloom": skipped},
    )
