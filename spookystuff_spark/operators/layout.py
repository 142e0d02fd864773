"""Physical-layout operators: input spreading, Z-order clustering.

``spread_small_input``: CPU-heavy per-row stages (n-gram explosion, Arrow
Python passes, per-doc hashing) inherit the SCAN's partitioning — and a small
corpus is often one parquet file = ONE task, serializing minutes of per-token
work onto a single core while 31 idle. Spreading costs one tiny shuffle of the
raw rows and buys full parallelism for the expensive stage. At 100 TB the
input already has thousands of splits, so spreading is a no-op there: the
helper repartitions ONLY when the planned input parallelism is materially
below the cluster's. It never narrows a wide input.

Z-order (Morton) multi-dimensional clustering for data-skipping.

Parquet scans prune row-groups/files on min-max statistics. Sorting by a
single column gives perfect skipping on that column and none on any
other; interleaving the bits of several columns (the Z-order curve,
Morton 1966 — the same layout Delta Lake's OPTIMIZE ZORDER BY and
ClickHouse's mortonEncode use) keeps every file's footprint small in ALL
interleaved dimensions at once, so selective filters on any of them
prune most files.

``zorder_sql`` renders the identical bit-interleave as an ANSI-SQL
string, so the DuckDB oracle computes byte-identical keys — the curve
itself is gate-checked, not just the write path.

Scale shape: ``zorder_write`` is one ``repartitionByRange`` on the key
(range exchange with a driver-side sampled boundary pass — Spark's
standard total-order machinery) plus an in-partition sort; no extra
shuffle beyond what any global sort pays. File count = shuffle
partitions of the writing stage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def spread_small_input(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    planned partition count is below ``defaultParallelism / factor``.
    Round-robin repartition — no key, no skew."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_in = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning hiccup: leave layout alone
        return df
    if n_in * factor < target:
        return df.repartition(target)
    return df


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleaved-bit Morton key over non-negative integral columns.

    Bit i of column j lands at output position ``i * ncols + j`` — with
    ``bits * ncols <= 63`` the key fits a signed long. Columns are masked
    to ``bits`` low bits first (callers rank/quantize wider domains)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols overflows a signed long")
    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_sql(col_names: list[str], bits: int = 16) -> str:
    """The same Morton key as ``zorder_key``, as an ANSI-SQL expression."""
    n = len(col_names)
    mask = (1 << bits) - 1
    terms = []
    for j, name in enumerate(col_names):
        v = f"(CAST({name} AS BIGINT) & {mask})"
        for i in range(bits):
            terms.append(f"((({v} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Cluster ``df`` on the Z-curve over ``cols`` and write parquet whose
    per-file min-max stats are tight in every clustered dimension."""
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    if num_files:
        keyed = keyed.repartitionByRange(num_files, "__z")
    else:
        keyed = keyed.repartitionByRange("__z")
    keyed.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-data-file min/max footprint from the parquet FOOTERS (no data
    read) — the exact statistics Spark's scan uses for row-group skipping.
    One dict per file: {file, n_rows, <col>_min, <col>_max}.

    This is the observability half of ``zorder_write``: a selective filter
    can only skip a file whose [min, max] footprint excludes the predicate,
    so tighter per-file ranges = more files skipped. ``tests`` prove the
    Z-order layout tightens every clustered dimension at once vs an
    unsorted write."""
    import pyarrow.parquet as _pq

    from spookystuff_spark import fsio

    out = []
    names = [n for n, _ in fsio.file_infos(path) if n.endswith(".parquet")]
    for name in names:
        f = fsio.join(path, name)
        md = _pq.ParquetFile(fsio.open_input(f)).metadata
        row = {"file": name, "n_rows": md.num_rows}
        idx = {n: i for i, n in enumerate(md.schema.names)}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            row[f"{c}_min"], row[f"{c}_max"] = lo, hi
        out.append(row)
    return out


def skipping_ratio(path: str, col: str, lo, hi) -> float:
    """Fraction of data files a range predicate [lo, hi] on ``col`` can
    SKIP on footer stats alone (1.0 = reads nothing, 0.0 = reads all)."""
    stats = file_minmax_stats(path, [col])
    if not stats:
        return 0.0
    skipped = sum(
        1
        for s in stats
        if s[f"{col}_min"] is not None
        and (s[f"{col}_max"] < lo or s[f"{col}_min"] > hi)
    )
    return skipped / len(stats)
