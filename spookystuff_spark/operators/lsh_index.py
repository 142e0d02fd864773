"""Incremental MinHash-LSH near-duplicate index over the lakehouse.

The batch near-dup pipeline (operators/dedup.py) recomputes every
signature per run; at 100 TB the realistic shape is "check tonight's
crawl batch against the standing corpus" — which needs the corpus's LSH
state to PERSIST and fold forward. The index is TWO partitioned
versioned tables (sources/partitioned_table.py) under ``index_dir``:

* ``bands/`` — one row per (doc, band): ``(id, band, band_hash)`` laid
  out by BAND-BUCKET (``bucket = crc32('<band>:<band_hash>') %
  n_buckets``). A probe joins its own band hashes against ONLY the
  buckets they hash into (manifest-pruned partition read) — the rest of
  the corpus's band rows are never listed or opened.
* ``sigs/`` — one row per doc: ``(id, sig array<bigint>)`` laid out by
  ID-HASH BUCKET. Candidate verification reads only the candidates'
  buckets and estimates Jaccard JVM-side as the matching-component
  fraction (``zip_with`` + ``aggregate`` — the standard MinHash
  estimator), so the probe path has zero Python in the hot loop.

Maintenance reads the DOCUMENT SOURCE'S CHANGE FEED: a new batch costs
one O(batch) signature pass (the same seed-fixed math as
``operators.dedup.minhash_bands`` — crc32 shingles, Mersenne-prime
permutations, blake2b band digests) plus one O(batch)
``append_partitioned`` commit per table (a doc's bands scatter across
buckets, which is exactly the append primitive's contract — a
touched-slice MERGE would rewrite the whole index per batch).

Crash consistency: both tables carry the ``_SRC_<version>`` watermark;
``bands/`` commits LAST and is the authoritative exactly-once marker. A
crash between the two commits leaves ``sigs/`` ahead — the re-run sees
its newer watermark and skips the sig append instead of duplicating
rows. Feeds must be INSERT-shaped (a rewritten document would need its
old band rows deleted, which an append cannot express) — anything else
raises and the caller rebuilds.

Reference scope: the reference has no persistent index surface at all
(its dedup is per-run); this composes the rebuild's own MinHash stack
with its lakehouse — public LSH (Broder) + Delta-style manifest ideas
only.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator, Sequence

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.operators.dedup import _perm_params, _shingle_hashes
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import (
    _SRC_MARK,
    _changes_since,
    insert_only_runs,
    last_processed_version,
    newest_marker,
)
from spookystuff_spark.sources.upsert import delete_by_keys, dv_contains_keys
from spookystuff_spark.sources.partitioned_table import (
    append_partitioned,
    read_table_partitions,
    write_table_partitioned,
)

_PARAMS = "lsh_params"
# append-step marker: deliberately NOT a `_SRC_` prefix (newest_marker
# prefix-matches, and the real watermark parse must never see step suffixes)
_STEP_MARK = "_SRCSTEP_"
def _bands_dir(index_dir: str) -> str:
    return f"{index_dir.rstrip('/')}/bands"


def _sigs_dir(index_dir: str) -> str:
    return f"{index_dir.rstrip('/')}/sigs"


def _band_bucket_expr(n_buckets: int):
    # crc32 of "<band>:<band_hash>" — zlib.crc32 mirrors F.crc32 exactly
    # (both CRC-32/ISO-HDLC over utf-8), same contract bm25_index relies on
    return F.concat(
        F.lit("b"),
        (
            F.crc32(F.concat_ws(":", F.col("band"), F.col("band_hash")))
            % n_buckets
        ).cast("string"),
    )


def _band_bucket_py(band: int, band_hash: int, n_buckets: int) -> str:
    return f"b{zlib.crc32(f'{band}:{band_hash}'.encode()) % n_buckets}"


def _sig_bucket_expr(n_buckets: int):
    return F.concat(
        F.lit("b"),
        (F.crc32(F.col("id").cast("string")) % n_buckets).cast("string"),
    )


def _sig_bucket_py(doc_id: int, n_buckets: int) -> str:
    return f"b{zlib.crc32(str(doc_id).encode()) % n_buckets}"


def _probe_rows(
    probes: Sequence[tuple[int, str]], params: dict
) -> tuple[list[tuple[int, int, int]], list[tuple[int, list[int]]]]:
    """Driver-side numpy signature pass: [(probe_id, band, band_hash)],
    [(probe_id, sig)] — same math as :func:`_signatures`. Production
    probes all run through :func:`lsh_index_query_df` now; this replica
    survives as the INDEPENDENT oracle the tests recompute expected band
    hashes and bucket lists with."""
    a, b = _perm_params(params["n_hashes"], params["seed"])
    rows_per_band = params["n_hashes"] // params["bands"]
    band_rows: list[tuple[int, int, int]] = []
    sig_rows: list[tuple[int, list[int]]] = []
    for pid, text in probes:
        h = _shingle_hashes(text, params["shingle_k"])
        if not len(h):
            continue
        sig = ((np.outer(a, h) + b[:, None]) % np.uint64((1 << 61) - 1)).min(
            axis=1
        )
        banded = sig.reshape(params["bands"], rows_per_band)
        for bi in range(params["bands"]):
            digest = hashlib.blake2b(banded[bi].tobytes(), digest_size=8)
            band_rows.append(
                (
                    int(pid),
                    bi,
                    int.from_bytes(digest.digest(), "big", signed=True),
                )
            )
        sig_rows.append((int(pid), [int(x) for x in sig.astype(np.int64)]))
    return band_rows, sig_rows


def _signatures(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_k: int,
    seed: int,
) -> DataFrame:
    """One narrow Arrow pass → one row per doc:
    ``(id, sig array<long>, band_hashes array<long>)``. Docs with an
    empty shingle set are skipped (no signature exists for them — same
    rule as ``minhash_bands``). Both index tables derive from this frame
    so the shingle/permutation work runs once per batch."""
    rows_per_band = n_hashes // bands
    a, b = _perm_params(n_hashes, seed)
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("sig", ArrayType(LongType())),
            StructField("band_hashes", ArrayType(LongType())),
        ]
    )
    parallelism = docs.sparkSession.sparkContext.defaultParallelism

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, sigs, bhs = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                h = _shingle_hashes(text, shingle_k)
                if not len(h):
                    continue
                sig = (
                    (np.outer(a, h) + b[:, None]) % np.uint64((1 << 61) - 1)
                ).min(axis=1)
                banded = sig.reshape(bands, rows_per_band)
                hashes = [
                    int.from_bytes(
                        hashlib.blake2b(
                            banded[bi].tobytes(), digest_size=8
                        ).digest(),
                        "big",
                        signed=True,
                    )
                    for bi in range(bands)
                ]
                ids.append(int(rid))
                sigs.append([int(x) for x in sig.astype(np.int64)])
                bhs.append(hashes)
            if ids:  # an all-empty batch can't carry the list dtypes
                yield pd.DataFrame(
                    {"id": ids, "sig": sigs, "band_hashes": bhs}
                )

    sel = docs.select(id_col, text_col)
    if sel.rdd.getNumPartitions() < parallelism:
        sel = sel.repartition(parallelism)
    return sel.mapInPandas(run, out_schema)


def _split_tables(wide: DataFrame, n_buckets: int) -> tuple[DataFrame, DataFrame]:
    band_rows = wide.select(
        "id", F.posexplode("band_hashes").alias("band", "band_hash")
    ).withColumn("bucket", _band_bucket_expr(n_buckets))
    sig_rows = wide.select("id", "sig").withColumn(
        "bucket", _sig_bucket_expr(n_buckets)
    )
    return band_rows, sig_rows


def index_params(index_dir: str) -> dict:
    m = U._read_manifest_raw(
        _bands_dir(index_dir), U.committed_versions(_bands_dir(index_dir))[-1]
    )  # params are raw top-level: no fold
    return m[_PARAMS]


def _sigs_n_buckets(index_dir: str) -> int:
    """The SIG table's own bucket count: its tip manifest's ``_PARAMS``
    when present (a :func:`rebucket_lsh_index` stamped it — including a
    rebucket that crashed between the two table rewrites, which leaves
    the sides at DIFFERENT counts), else the bands-side params (ordinary
    appends/deletes don't re-stamp sig params; pre-r10 indexes never
    had them). Each side resolving its own count keeps every read
    self-consistent across the rebucket crash window."""
    sd = _sigs_dir(index_dir)
    raw = U._read_manifest_raw(sd, U.committed_versions(sd)[-1]) or {}
    p = raw.get(_PARAMS)
    if p is not None:
        return int(p["n_buckets"])
    return int(index_params(index_dir)["n_buckets"])


def build_lsh_index(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    n_buckets: int = 8,
) -> str:
    """Signature-pass the current source snapshot into the two index
    tables. Returns the bands-table version (the index version); the
    source watermark rides both commits so a follow-up
    :func:`refresh_lsh_index` starts exactly after this snapshot."""
    if n_hashes % bands:
        raise ValueError(f"n_hashes={n_hashes} not divisible by bands={bands}")
    src_v = U.committed_versions(src_dir)[-1]
    docs = U.read_table(spark, src_dir)
    params = {
        "n_hashes": n_hashes,
        "bands": bands,
        "shingle_k": shingle_k,
        "seed": seed,
        "n_buckets": n_buckets,
    }
    wide = _signatures(
        docs, id_col, text_col, n_hashes, bands, shingle_k, seed
    ).localCheckpoint(eager=True)  # one signature pass feeds both writes
    band_rows, sig_rows = _split_tables(wide, n_buckets)
    marker = f"{_SRC_MARK}{src_v}"
    # sigs first, bands last: bands' watermark is the authoritative one
    write_table_partitioned(
        sig_rows, _sigs_dir(index_dir), "bucket",
        marker=marker, change_feed=False,
    )
    write_table_partitioned(
        band_rows, _bands_dir(index_dir), "bucket",
        marker=marker, change_feed=False, extra_fields={_PARAMS: params},
    )
    return U.committed_versions(_bands_dir(index_dir))[-1]


def _fold_table(
    spark: SparkSession,
    table_dir: str,
    ins_rows: DataFrame | None,
    del_ids: DataFrame | None,
    src_v: str,
    params: dict | None,
) -> None:
    """One table's fold of ONE source version — append then DV-delete,
    the REAL ``_SRC_`` watermark riding only the sequence's FINAL commit
    so a crash anywhere inside re-runs this version; the append step
    stamps an auxiliary ``_SRCSTEP_`` marker making the re-run skip it
    instead of double-appending. Both guards compare against the single
    version being folded, so source commits that land AFTER a crash can
    never widen the batch under the heal (they are later iterations of
    the per-version replay)."""
    wm = last_processed_version(table_dir)
    if wm is not None and U._vnum(wm) >= U._vnum(src_v):
        return  # this table already covers the version (crash heal)
    marker = f"{_SRC_MARK}{src_v}"
    extra = {_PARAMS: params} if params is not None else None
    if ins_rows is not None:
        step = newest_marker(table_dir, _STEP_MARK)
        if step is None or U._vnum(step) < U._vnum(src_v):
            append_partitioned(
                spark, table_dir, ins_rows, "bucket",
                marker=(f"{_STEP_MARK}{src_v}" if del_ids is not None
                        else marker),
                change_feed=False, extra_fields=extra,
            )
        if del_ids is None:
            return
    delete_by_keys(
        spark, table_dir, del_ids, ["id"], marker=marker,
        extra_fields=extra,
    )


def _fold_version(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    changes: DataFrame,
    src_v: str,
    params: dict,
    id_col: str,
    text_col: str,
) -> bool:
    """Apply one source version's feed to both index tables. Returns
    True when any commit landed (False = the version was invisible to
    the index, e.g. only shingle-empty docs)."""
    bands_dir, sigs_dir = _bands_dir(index_dir), _sigs_dir(index_dir)
    kinds = {r[0] for r in changes.select("_change").distinct().collect()}
    if kinds - {"insert", "delete"}:
        raise ValueError(
            f"{src_dir}/{src_v}: LSH index refresh folds insert/delete "
            f"feeds — got kinds {sorted(kinds)}; a rewritten document's "
            "old and new band rows share its id (a key vector can't hide "
            "one without the other), rebuild instead"
        )
    changes = changes.localCheckpoint(eager=True)  # feeds several jobs
    del_ids = None
    if "delete" in kinds:
        del_ids = (
            changes.where(F.col("_change") == "delete")
            .select(F.col(id_col).cast("long").alias("id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    band_rows = sig_rows = None
    if "insert" in kinds:
        ins = changes.where(F.col("_change") == "insert")
        if del_ids is not None and (
            ins.select(F.col(id_col).cast("long").alias("id"))
            .join(del_ids, "id", "leftsemi")
            .limit(1)
            .count()
        ):
            # unreachable through the public writers (one commit = one
            # kind) but a hand-built feed could do it — refuse, the row
            # order inside one version's feed files is meaningless
            raise ValueError(
                f"{src_dir}/{src_v}: a document is both inserted and "
                "deleted inside one source version — the feed carries no "
                "row order; rebuild instead"
            )
        wide = _signatures(
            ins.select(id_col, text_col), id_col, text_col,
            params["n_hashes"], params["bands"], params["shingle_k"],
            params["seed"],
        ).localCheckpoint(eager=True)
        if not wide.limit(1).count():
            wide = None  # every inserted doc was shingle-empty: no rows
        if wide is not None and dv_contains_keys(
            spark, bands_dir, wide.select("id")
        ):
            raise ValueError(
                f"{index_dir}: re-inserting a document the index's "
                "deletion vector currently hides — the vector would hide "
                "the new rows too; run compact_lsh_index(force_dv=True) "
                "to materialize the vectors, then refresh again"
            )
        if wide is not None:
            band_rows, sig_rows = _split_tables(wide, params["n_buckets"])
    if band_rows is None and del_ids is None:
        return False  # invisible version: the next fold's marker covers it
    # sigs fully first, bands last: bands' watermark is the authoritative one
    _fold_table(spark, sigs_dir, sig_rows, del_ids, src_v, None)
    _fold_table(spark, bands_dir, band_rows, del_ids, src_v, params)
    return True


def refresh_lsh_index(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str | None:
    """Fold source changes since the watermark into the index — a
    PER-VERSION replay: each pending source version folds on its own
    (one signature pass over its new documents + one O(batch)
    partitioned append per table; its deleted documents become an
    O(deleted) key deletion vector via ``delete_by_keys`` — zero index
    scan, every reader anti-joins it away), and its ``_SRC_`` watermark
    commits before the next version starts. A crash therefore heals by
    SKIPPING the versions already covered (per-table watermark + step
    markers) — source commits that land after the crash are later
    iterations, never a widened batch re-fold — and a doc deleted in
    one version and re-anything'd in a later one is two separate folds,
    so the only insert+delete refusal left is the hand-built
    single-version feed. Returns the newest bands version committed, or
    None when the source has nothing the index can see.

    CONTIGUOUS ``append``-kind versions (pure insert feeds) batch into
    ONE fold (``insert_only_runs``): K crawl batches between refreshes
    cost one signature pass and one append per table, not K — exact
    because inserts commute and the signature pass is row-per-row (a
    doc appended twice yields the same duplicated band/sig rows either
    way, so no duplicate-id fallback is needed here, unlike BM25's
    collapsing stats pass). Crash consistency across a batched run:
    when ``sigs/`` is ahead of ``bands/`` (the crash window between the
    two commits), the FIRST run is pinned to exactly the versions the
    sigs watermark covers — bands catches up with the identical extent
    while sigs skips via its watermark, so source commits landing after
    the crash can still never widen the batch under the heal.

    Refusals (each raises with the heal path named): update-shaped
    feeds (an update's old and new band rows share the doc id, which a
    table-level key vector can't tell apart — rebuild); re-inserting a
    doc the vector currently hides (the vector would hide the new rows
    too — ``compact_lsh_index(force_dv=True)`` materializes it)."""
    bands_dir = _bands_dir(index_dir)
    wm = last_processed_version(bands_dir)
    pending = [
        v
        for v in U.committed_versions(src_dir)
        if wm is None or U._vnum(v) > U._vnum(wm)
    ]
    if not pending:
        return None
    params = index_params(index_dir)
    if _sigs_n_buckets(index_dir) != int(params["n_buckets"]):
        raise ValueError(
            f"{index_dir}: the two index tables are at different bucket "
            "counts (a rebucket_lsh_index crashed between its rewrites) — "
            "re-run rebucket_lsh_index to finish before refreshing"
        )
    prev, committed = wm, False
    meta_cache: dict = {}  # O(pending) metadata reads across the replay
    sig_wm = last_processed_version(_sigs_dir(index_dir))
    if sig_wm is not None and (wm is None or U._vnum(sig_wm) > U._vnum(wm)):
        # crash heal: re-fold EXACTLY the extent the sigs watermark
        # proves the crashed fold had, as one run
        head = [v for v in pending if U._vnum(v) <= U._vnum(sig_wm)]
        tail = [v for v in pending if U._vnum(v) > U._vnum(sig_wm)]
        runs = ([head] if head else []) + insert_only_runs(
            src_dir, tail, meta_cache
        )
    else:
        runs = insert_only_runs(src_dir, pending, meta_cache)
    for run in runs:
        v = run[-1]
        changes, _ = _changes_since(
            spark, src_dir, prev, requested_cols=[id_col, text_col],
            until=v, meta_cache=meta_cache,
        )
        prev = v
        if changes is None:
            continue  # feed-less version: the next fold's marker covers it
        committed = _fold_version(
            spark, src_dir, index_dir, changes, v, params, id_col, text_col
        ) or committed
    return U.committed_versions(bands_dir)[-1] if committed else None


def _candidate_pairs(matched: DataFrame, max_bucket: int) -> DataFrame:
    """Distinct (probe_id, id) candidates from band-hash matches, with
    degenerate (band, band_hash) groups larger than ``max_bucket`` INDEX
    members dropped, not exploded (the batch pipeline's boilerplate
    policy — the cap counts the full index-side group, BEFORE the
    self-filter), and self-pairs removed."""
    sizes = matched.groupBy("band", "band_hash").agg(
        F.countDistinct("id").alias("__n_members")
    )
    return (
        matched.join(sizes, ["band", "band_hash"])
        .where(F.col("__n_members") <= max_bucket)
        .where(F.col("id") != F.col("probe_id"))
        .select("probe_id", "id")
        .distinct()
    )


def _verified_pairs(
    cands: DataFrame,
    sig_slice: DataFrame,
    psigs: DataFrame,
    n_hashes: int,
    threshold: float,
) -> DataFrame:
    """JVM-side MinHash verification: matching-component fraction of the
    candidate's stored sig vs the probe's (``zip_with`` + ``aggregate`` —
    the standard estimator), thresholded. ``psigs``: (probe_id, psig) —
    pre-hint ``F.broadcast`` when small by contract."""
    est = (
        F.aggregate(
            F.zip_with(
                "sig", "psig",
                lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(float(n_hashes))
    )
    return (
        cands.join(sig_slice, "id")
        .join(psigs, "probe_id")
        .select("probe_id", "id", round_stable(est, 4).alias("est_sim"))
        .where(F.col("est_sim") >= threshold)
    )


def lsh_index_query(
    spark: SparkSession,
    index_dir: str,
    probes: Sequence[tuple[int, str]],
    threshold: float = 0.5,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicates of a probe batch against the indexed corpus →
    ``(probe_id, id, est_sim)`` with the MinHash estimate ≥ ``threshold``.

    Thin list-shaped wrapper over :func:`lsh_index_query_df` — the ONE
    probe pipeline (r10 kept a parallel driver-enumerated copy; the two
    were test-pinned value-identical, so the list path now just lifts its
    probes into a two-column frame and delegates). All probe semantics —
    candidate policy, ``max_bucket`` cap, self-pair suppression,
    manifest-pruned bucket reads — are documented on the DataFrame
    entry point."""
    probe_df = spark.createDataFrame(
        [(int(pid), str(text)) for pid, text in probes],
        "doc_id long, text string",
    )
    return lsh_index_query_df(
        spark, index_dir, probe_df,
        id_col="doc_id", text_col="text",
        threshold=threshold, max_bucket=max_bucket,
    )


def lsh_index_query_df(
    spark: SparkSession,
    index_dir: str,
    probe_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = 64,
) -> DataFrame:
    """THE LSH probe pipeline (``lsh_index_query`` is a thin list-shaped
    wrapper over it) — the module's own motivating case is "check
    tonight's crawl batch against the standing corpus", and that batch is
    itself a table, not a Python list. Output (``probe_id, id, est_sim``
    at the MinHash estimate ≥ ``threshold``), candidates capped by
    ``max_bucket`` before the self-filter, with ZERO driver involvement
    in the data plane:

    * probe signatures come from the same :func:`_signatures`
      ``mapInPandas`` pass the index build/refresh uses (one Arrow pass
      over the batch — the driver never sees a signature);
    * the band-bucket and sig-bucket collects gather only DISTINCT BUCKET
      IDS (bounded by the index's ``n_buckets``, never by probe or
      candidate count), so manifest pruning still skips unprobed buckets
      — a small batch touches few band buckets and reads only those,
      while a corpus-sized batch degrades gracefully to reading all of
      them (which it must);
    * candidates stay distributed end-to-end (no driver enumeration of
      candidate ids — the sig read prunes by the candidates' OWN buckets
      and semi-joins the exact id set executor-side);
    * no broadcast hints on the probe side — AQE picks the join strategy
      from actual sizes, so the same code serves a 100-row smoke probe
      and a 100-GB nightly batch.

    Probe rows whose shingle set is empty are skipped (no signature
    exists — the :func:`_signatures` rule); a probe doc already in the
    index never pairs with itself."""
    params = index_params(index_dir)
    n_buckets, n_hashes = params["n_buckets"], params["n_hashes"]
    empty = spark.createDataFrame(
        [], "probe_id long, id long, est_sim double"
    )
    wide = _signatures(
        probe_df.select(id_col, text_col), id_col, text_col,
        params["n_hashes"], params["bands"], params["shingle_k"],
        params["seed"],
    ).localCheckpoint(eager=True)  # one signature pass feeds bands + sigs
    band_rows = wide.select(
        F.col("id").alias("probe_id"),
        F.posexplode("band_hashes").alias("band", "band_hash"),
    )
    # bounded collect: DISTINCT BUCKETS only (≤ n_buckets rows, whatever
    # the probe cardinality) — keeps the manifest-pruned read for small
    # batches without ever enumerating probe rows on the driver
    buckets = sorted(
        r[0]
        for r in band_rows.select(
            _band_bucket_expr(n_buckets).alias("_b")
        )
        .distinct()
        .collect()
    )
    if not buckets:
        return empty  # every probe doc was shingle-empty
    slice_df = read_table_partitions(spark, _bands_dir(index_dir), buckets)
    matched = slice_df.join(band_rows, ["band", "band_hash"])
    cands = _candidate_pairs(matched, max_bucket).localCheckpoint(
        eager=True
    )  # feeds the bucket collect AND the verify join
    cand_buckets = sorted(
        r[0]
        for r in cands.select(
            _sig_bucket_expr(_sigs_n_buckets(index_dir)).alias("_b")
        )
        .distinct()
        .collect()
    )
    if not cand_buckets:
        return empty
    sig_slice = read_table_partitions(
        spark, _sigs_dir(index_dir), cand_buckets
    ).join(cands.select("id").distinct(), "id", "leftsemi")
    psigs = wide.select(
        F.col("id").alias("probe_id"), F.col("sig").alias("psig")
    )
    return _verified_pairs(cands, sig_slice, psigs, n_hashes, threshold)


def compact_lsh_index(
    spark: SparkSession,
    index_dir: str,
    max_files_per_bucket: int = 8,
    force_dv: bool = False,
) -> tuple[str | None, str | None]:
    """OPTIMIZE-when-fragmented for both index tables (every refresh
    appends ~one file per touched bucket). The ``_SRC_`` watermark is
    re-stamped on each compacted version so the exactly-once contract
    survives a later vacuum of the marker's original commit.
    ``force_dv=True`` additionally compacts any table whose deletion
    vector is non-empty even when nothing is fragmented — compaction
    reads through the DV-applied snapshot, so it MATERIALIZES the
    deletes and clears the vector (the heal :func:`refresh_lsh_index`
    names before a deleted doc can be re-inserted). Returns
    (bands version, sigs version), None where nothing was rewritten."""
    from spookystuff_spark.sources.partitioned_table import (
        compact_auto_partitioned,
    )

    out = []
    for d in (_bands_dir(index_dir), _sigs_dir(index_dir)):
        wm = last_processed_version(d)
        out.append(
            compact_auto_partitioned(
                spark, d, "bucket",
                max_files_per_partition=max_files_per_bucket,
                force_dv=force_dv,
                marker=f"{_SRC_MARK}{wm}" if wm else None,
            )
        )
    return out[0], out[1]


def rebucket_lsh_index(
    spark: SparkSession, index_dir: str, n_buckets: int
) -> tuple[str, str] | None:
    """Re-seed BOTH index tables at a new bucket count: band rows re-lay
    by the band-bucket hash, signatures by the id-hash bucket — one read
    through each current snapshot (deletion vectors materialize away),
    params updated in the bands manifest, each table's ``_SRC_``
    watermark re-stamped (sigs first, bands authoritative last — the
    build's commit order). The signature math is untouched, so probes
    answer identically at any bucket count; what changes is the pruning
    granularity a probe's manifest read gets. No-op (None) only when BOTH
    tables are already at the requested count — a rebucket that crashed
    between the two rewrites leaves sigs at the new count and bands at
    the old, and a re-run requesting the ORIGINAL (bands) count must
    rewrite the sigs side back rather than no-op into a permanently
    mismatched pair (r10 advice)."""
    params = dict(index_params(index_dir))
    bands_count = int(params["n_buckets"])
    sigs_count = int(_sigs_n_buckets(index_dir))
    if bands_count == int(n_buckets) and sigs_count == int(n_buckets):
        return None
    from spookystuff_spark.sources.incremental import resolve_restamp_marker

    bands_dir, sigs_dir = _bands_dir(index_dir), _sigs_dir(index_dir)
    marker = resolve_restamp_marker(bands_dir, "rebucket")
    params["n_buckets"] = int(n_buckets)
    if sigs_count != int(n_buckets):
        sig_rows = (
            U.read_table(spark, sigs_dir)
            .drop("bucket")
            .withColumn("bucket", _sig_bucket_expr(int(n_buckets)))
        )
        # the sigs rewrite stamps the NEW params on ITS OWN manifest: a
        # crash before the bands rewrite leaves the sides at different
        # counts, and each read resolving its own count
        # (_sigs_n_buckets) is what keeps that window self-consistent;
        # the re-run skips the side that already landed
        write_table_partitioned(
            sig_rows, sigs_dir, "bucket",
            marker=marker, change_feed=False, extra_fields={_PARAMS: params},
        )
    if bands_count != int(n_buckets):
        # mirror of the sigs-side guard (r11 verdict #2): in the
        # crash-recovery rebucket back to the bands' own count, only the
        # sigs side needs rewriting — re-laying an already-correct bands
        # table would be a full wasted rewrite
        band_rows = (
            U.read_table(spark, bands_dir)
            .drop("bucket")
            .withColumn("bucket", _band_bucket_expr(int(n_buckets)))
        )
        write_table_partitioned(
            band_rows, bands_dir, "bucket",
            marker=marker, change_feed=False, extra_fields={_PARAMS: params},
        )
    return (
        U.committed_versions(bands_dir)[-1],
        U.committed_versions(sigs_dir)[-1],
    )


def streaming_refresh_sink(
    src_dir: str,
    index_dir: str,
    max_files_per_bucket: int | None = None,
    **refresh_kwargs,
):
    """``foreachBatch`` body keeping the LSH index CONTINUOUSLY fresh from
    the ``spooky_versioned`` CDC stream — same exactly-once contract as
    ``bm25_index.streaming_refresh_sink`` (the ``_SRC_`` watermark, not
    the stream checkpoint, is the source of truth)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        refresh_lsh_index(
            batch_df.sparkSession, src_dir, index_dir, **refresh_kwargs
        )
        if max_files_per_bucket is not None:
            compact_lsh_index(
                batch_df.sparkSession, index_dir, max_files_per_bucket
            )

    return sink
