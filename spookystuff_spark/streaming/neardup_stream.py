"""Incremental NEAR-dup dedup for a document stream — the MinHash twin of
operators/bloom.py's exact-dedup path.

Exact streaming dedup (bloom / dropDuplicatesWithinWatermark) only catches
byte-identical docs; a crawl's real redundancy is near-duplicates. Protocol,
per micro-batch:

1. MinHash-band the BATCH (narrow Arrow stage, batch-sized).
2. Probe the accumulated band table: ``state ⋈ broadcast(batch_bands)`` on
   (band, band_hash). The corpus-sized state is scanned, never shuffled,
   and never rebuilt — the same never-shuffle-the-corpus rule as the Bloom
   probe (plan-asserted there).
3. A batch doc whose band collides with ANY accepted doc (or with an
   earlier doc in the same batch — lower id wins, deterministic) is a
   near-dup and is dropped.
4. Survivors' bands APPEND to the state table (versioned-table commit with
   the batch-id marker → exactly-once under foreachBatch replays).

State is O(accepted docs × bands) longs — the minimal sketch that supports
collision probing; raw text never lands in state. At 100 TB the state table
is a parquet table like any other: compact it with ``compact_auto`` and the
probe stays one broadcast hash join per batch.

Band-collision near-dup (no verify pass) errs toward dropping: with 128
hashes / 16 bands a single-band collision ≈ jaccard ≥ ~0.5 corpus pair.
Callers wanting verified drops run the batch pairs through
``dedup.jaccard`` — the batch side is small, so verification is cheap.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spookystuff_spark.operators.dedup import minhash_bands
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.streaming.sink import batch_marker_name, last_committed_batch


def accepted_ids(spark, state_dir: str) -> DataFrame:
    """Distinct doc ids currently accepted into the deduped corpus."""
    return U.read_table(spark, state_dir).select("id").distinct()


def near_dup_ids(state: DataFrame | None, bands_df: DataFrame) -> DataFrame:
    """Ids in ``bands_df`` that band-collide with the accepted corpus
    (``state``) or with a lower-id doc in the same batch → one ``id``
    column. The state side is only ever SCANNED and hash-probed against the
    broadcast batch — asserting this plan shape is a test's job
    (test_neardup_stream.py): a sort-merge join here would shuffle the
    corpus-sized state every micro-batch."""
    a = bands_df.select(F.col("id").alias("id_a"), "band", "band_hash")
    b = bands_df.select(F.col("id").alias("id_b"), "band", "band_hash")
    # explicit broadcast: the Arrow-stage output has no stats, so Catalyst
    # would otherwise sort-merge even this micro-batch-sized self-join
    dup_in_batch = (
        F.broadcast(a).join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    if state is None:
        return dup_in_batch
    dup_vs_state = (
        state.join(
            F.broadcast(
                bands_df.select(F.col("id").alias("_qid"), "band", "band_hash")
            ),
            ["band", "band_hash"],
        )
        .select(F.col("_qid").alias("id"))
        .distinct()
    )
    return dup_in_batch.unionByName(dup_vs_state).distinct()


def streaming_neardup_sink(
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 128,
    bands: int = 16,
    on_accept: Callable[[DataFrame], None] | None = None,
    app_id: str | None = None,
    compact_every: int | None = None,
    compact_files: int = 8,
    vacuum_keep: int = 4,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: drop near-dups of everything accepted so far,
    append survivors' band sketches to the state table, and (optionally)
    hand the surviving ROWS to ``on_accept`` (e.g. write to the output
    corpus) — called before the state commit, so a crash replays the batch
    and ``on_accept`` must be idempotent like any foreachBatch body.

    ``compact_every=N`` turns on in-sink maintenance: every N batches the
    state table is compacted to ``compact_files`` files and vacuumed to
    ``vacuum_keep`` versions. Metadata-only appends never rewrite data, so
    without this the state accretes one file AND one version per batch
    forever — the probe scan slows (task-per-file) and the version list
    grows unboundedly. The compacted commit CARRIES the current batch
    marker, so replay protection survives vacuum dropping the marker's
    original append version; vacuum itself is manifest-aware and never
    deletes files a kept version still references."""
    from spookystuff_spark.streaming.sink import check_appless_markers

    check_appless_markers(state_dir, app_id)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = last_committed_batch(state_dir, app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already folded into state
        bands_df = minhash_bands(
            batch_df, id_col, text_col, n_hashes=n_hashes, bands=bands
        ).localCheckpoint(eager=True)  # reused 3x; tiny (batch-sized)

        state = (
            U.read_table(spark, state_dir)
            if U.committed_versions(state_dir)
            else None
        )
        dups = near_dup_ids(state, bands_df)

        survivors = bands_df.join(dups, "id", "left_anti")
        if on_accept is not None:
            kept_rows = batch_df.join(
                survivors.select("id").distinct().withColumnRenamed(
                    "id", id_col
                ),
                id_col,
                "leftsemi",
            )
            on_accept(kept_rows)

        # append survivors' sketches as a metadata-only commit (previous
        # state files are carried forward by manifest reference, not
        # rewritten — O(batch) per batch, O(table) would be the classic
        # streaming-state scale bug); exactly-once via the (app, batch)
        # marker — pass app_id per checkpoint so a fresh checkpoint's
        # restarted batch ids are not mistaken for replays
        U.append_rows(
            spark,
            state_dir,
            survivors,
            marker=batch_marker_name(batch_id, app_id),
        )

        # periodic maintenance: O(state) rewrite amortized over N O(batch)
        # appends; the marker rides the compacted version (see docstring)
        if compact_every and (batch_id + 1) % compact_every == 0:
            U.compact(
                spark,
                state_dir,
                num_files=compact_files,
                marker=batch_marker_name(batch_id, app_id),
            )
            U.vacuum(state_dir, keep=vacuum_keep)

    return sink


# ------------------------------------------------- 64-bit-signature twin


def _bands_of(df: DataFrame, id_col: str, hash_col: str, n_bands: int) -> DataFrame:
    """(id, hash) → (id, hash, band_idx, band_bits) — the same disjoint-band
    split as operators/multimodal.hamming64_neardup_pairs, inline so the
    state side stays a narrow explode (never shuffled)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(f"shiftrightunsigned({hash_col}, {i * width})")
                        .bitwiseAND(F.lit(mask))
                        .alias("band_bits"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("id", "sig", "b.band_idx", "b.band_bits")


def streaming_hash_neardup_sink(
    state_dir: str,
    id_col: str,
    hash_col: str,
    max_hamming: int = 7,
    n_bands: int = 8,
    on_accept: Callable[[DataFrame], None] | None = None,
    app_id: str | None = None,
    compact_every: int | None = None,
    compact_files: int = 8,
    vacuum_keep: int = 4,
) -> Callable[[DataFrame, int], None]:
    """Incremental near-dup dedup for a MEDIA stream — the 64-bit-signature
    twin of :func:`streaming_neardup_sink` (MinHash/text). The stream
    carries perceptual signatures (``image_phash`` / ``audio_fingerprint``
    / per-frame hashes run fine on streaming DataFrames — one narrow Arrow
    stage); this foreachBatch sink drops batch rows within Hamming
    ``max_hamming`` of anything accepted so far, using the banded equality
    probe: state is SCANNED and band-exploded in place (narrow), the
    micro-batch side is broadcast — the corpus-sized state is never
    shuffled, same rule as the text sink. Survivors' (id, sig) rows append
    as metadata-only commits with (app, batch) exactly-once markers, and
    the same ``compact_every`` maintenance bounds files/versions with
    replay protection intact. Requires ``max_hamming < n_bands``
    (pigeonhole recall)."""
    if max_hamming >= n_bands or 64 % n_bands != 0:
        raise ValueError("need max_hamming < n_bands and n_bands | 64")
    from spookystuff_spark.streaming.sink import check_appless_markers

    check_appless_markers(state_dir, app_id)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = last_committed_batch(state_dir, app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already folded into state
        sigs = (
            batch_df.select(
                F.col(id_col).alias("id"), F.col(hash_col).alias("sig")
            )
            .where(F.col("sig").isNotNull())
            .localCheckpoint(eager=True)  # tiny; reused for probe + append
        )
        bands = _bands_of(sigs, "id", "sig", n_bands)

        # in-batch: lower id wins among colliding pairs
        a = bands.select(
            F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
            "band_idx", "band_bits",
        )
        b = bands.select(
            F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
            "band_idx", "band_bits",
        )
        dup_in_batch = (
            F.broadcast(a)
            .join(b, ["band_idx", "band_bits"])
            .where(F.col("id_a") < F.col("id_b"))
            .where(
                F.bit_count(F.expr("sig_a ^ sig_b")) <= max_hamming
            )
            .select(F.col("id_b").alias("id"))
            .distinct()
        )
        dups = dup_in_batch
        if U.committed_versions(state_dir):
            state = U.read_table(spark, state_dir)
            state_bands = _bands_of(state, "id", "sig", n_bands).select(
                F.col("sig").alias("sig_s"), "band_idx", "band_bits"
            )
            dup_vs_state = (
                state_bands.join(
                    F.broadcast(
                        bands.select(
                            F.col("id").alias("_qid"),
                            F.col("sig").alias("sig_q"),
                            "band_idx",
                            "band_bits",
                        )
                    ),
                    ["band_idx", "band_bits"],
                )
                .where(
                    F.bit_count(F.expr("sig_s ^ sig_q")) <= max_hamming
                )
                .select(F.col("_qid").alias("id"))
                .distinct()
            )
            dups = dup_in_batch.unionByName(dup_vs_state).distinct()

        survivors = sigs.join(dups, "id", "left_anti")
        if on_accept is not None:
            kept_rows = batch_df.join(
                survivors.select("id").withColumnRenamed("id", id_col),
                id_col,
                "leftsemi",
            )
            on_accept(kept_rows)

        U.append_rows(
            spark,
            state_dir,
            survivors,
            marker=batch_marker_name(batch_id, app_id),
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            U.compact(
                spark,
                state_dir,
                num_files=compact_files,
                marker=batch_marker_name(batch_id, app_id),
            )
            U.vacuum(state_dir, keep=vacuum_keep)

    return sink
