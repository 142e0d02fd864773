"""Round-10 maintenance hardening: rebucket() re-seeding, the maintained-
column-set refusal (silent-narrowing guard), the meta_cache source binding,
and restore()'s duplicate-key probe with a key column literally named
``count``."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.sources import incremental as INC
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import (
    agg_layout,
    last_processed_version,
    rebucket,
    refresh_aggregate,
    refresh_distinct,
)
from spookystuff_spark.sources.partitioned_table import _part_of


def _rows(spark, data):
    return spark.createDataFrame(data, "k int, grp string, val long")


def _expected(spark, src):
    return {
        (r["grp"], r["val_sum"], r["n_rows"])
        for r in U.read_table(spark, src)
        .groupBy("grp")
        .agg(F.sum("val").alias("val_sum"), F.count("*").alias("n_rows"))
        .collect()
    }


def _got(spark, dst):
    return {
        (r["grp"], r["val_sum"], r["n_rows"])
        for r in U.read_table(spark, dst).collect()
    }


def test_rebucket_reseeds_and_keyed_folds_resume(spark, tmp_path):
    """Seed at 4 buckets, rebucket to 16: values and watermark survive,
    the layout manifest records the new count, and a follow-up one-group
    delta rewrites exactly ONE bucket at the new count (the keyed-fold
    scale pin, re-verified post-rebucket)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    base = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 64).cast("string")).alias("grp"),
        (F.col("id") * 3).cast("long").alias("val"),
    )
    U.write_table(base, src)
    refresh_aggregate(spark, src, dst, ["grp"], ["val"], dst_buckets=4)
    wm = last_processed_version(dst)
    before = _got(spark, dst)

    assert rebucket(spark, dst, 4) is None  # same count: no-op
    v = rebucket(spark, dst, 16)
    assert v is not None
    assert agg_layout(dst) == (16, ["grp"])
    assert _got(spark, dst) == before == _expected(spark, src)
    assert last_processed_version(dst) == wm  # watermark re-stamped

    # a refresh at the OLD explicit count now refuses (layout wins)
    U.append_rows(spark, src, _rows(spark, [(9001, "g7", 5)]))
    with pytest.raises(ValueError, match="buckets"):
        refresh_aggregate(spark, src, dst, ["grp"], ["val"], dst_buckets=4)

    # keyed folds resume at the new count: one-group delta → one bucket
    v2 = refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    raw = U._read_manifest_raw(dst, v2)
    assert "files_base" in raw, "post-rebucket refresh must stay a delta"
    assert len({_part_of(e) for e in raw["files_add"]}) == 1
    assert _got(spark, dst) == _expected(spark, src)


def test_rebucket_refuses_non_keyed_table(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(_rows(spark, [(1, "a", 10)]), src)
    refresh_aggregate(spark, src, dst, ["grp"], ["val"])  # plain layout
    with pytest.raises(ValueError, match="not a keyed"):
        rebucket(spark, dst, 8)


def test_rebucket_works_on_distinct_support(spark, tmp_path):
    """The support Z-set commits through the same keyed path — rebucket
    re-seeds it too, and distinct folds resume."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "sup")
    U.write_table(
        _rows(spark, [(1, "a", 10), (2, "a", 10), (3, "a", 20), (4, "b", 5)]),
        src,
    )
    refresh_distinct(spark, src, dst, ["grp"], "val", dst_buckets=4)
    assert rebucket(spark, dst, 8) is not None
    U.delete_where(spark, src, F.col("k") == 3)
    refresh_distinct(spark, src, dst, ["grp"], "val")
    got = {
        (r["grp"], r["val_distinct"])
        for r in INC.read_distinct_aggregate(
            spark, dst, ["grp"], "val"
        ).collect()
    }
    assert got == {("a", 1), ("b", 1)}


def test_refresh_refuses_narrowed_column_set(spark, tmp_path):
    """A later refresh omitting an agg-col family must refuse instead of
    silently rewriting buckets without the maintained column (ADVICE r9)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(_rows(spark, [(1, "a", 10), (2, "b", 20)]), src)
    refresh_aggregate(
        spark, src, dst, ["grp"], ["val"], sumsq_cols=["val"], dst_buckets=4
    )
    U.append_rows(spark, src, _rows(spark, [(3, "a", 7)]))
    with pytest.raises(ValueError, match="maintained columns"):
        refresh_aggregate(spark, src, dst, ["grp"], ["val"])  # no sumsq
    with pytest.raises(ValueError, match="maintained columns"):
        refresh_aggregate(  # widened: min/max can't backfill either
            spark, src, dst, ["grp"], ["val"],
            min_cols=["val"], sumsq_cols=["val"],
        )
    # the matching set still folds
    assert refresh_aggregate(
        spark, src, dst, ["grp"], ["val"], sumsq_cols=["val"]
    ) is not None
    got = {
        (r["grp"], r["val_sum"], r["val_sumsq"], r["n_rows"])
        for r in U.read_table(spark, dst).collect()
    }
    assert got == {("a", 17, 149, 2), ("b", 20, 400, 1)}


def test_join_aggregate_refuses_narrowed_column_set(spark, tmp_path):
    from spookystuff_spark.sources.join_view import refresh_join_aggregate

    a, b, dst = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "j")
    U.write_table(
        spark.createDataFrame([(1, "s1", 10)], "id int, seg string, price long"),
        a,
    )
    U.write_table(spark.createDataFrame([(1, "x")], "id int, tag string"), b)
    refresh_join_aggregate(
        spark, a, b, dst, ["id"], ["seg"], ["price"], sumsq_cols=["price"]
    )
    U.append_rows(
        spark, a,
        spark.createDataFrame([(2, "s1", 30)], "id int, seg string, price long"),
    )
    U.append_rows(spark, b, spark.createDataFrame([(2, "y")], "id int, tag string"))
    with pytest.raises(ValueError, match="maintained columns"):
        refresh_join_aggregate(spark, a, b, dst, ["id"], ["seg"], ["price"])


def test_meta_cache_bound_to_one_source(spark, tmp_path):
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    U.write_table(_rows(spark, [(1, "a", 1)]), s1)
    U.write_table(_rows(spark, [(9, "z", 9)]), s2)
    cache: dict = {}
    INC._changes_since(spark, s1, None, meta_cache=cache)
    with pytest.raises(ValueError, match="bound to"):
        INC._changes_since(spark, s2, None, meta_cache=cache)


def test_restore_keyed_diff_with_count_key_column(spark, tmp_path):
    """A key column literally named ``count`` must not break the
    duplicate-key probe (ADVICE r9: the old groupBy().count() made
    F.col('count') ambiguous)."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 5), (2, 6)], "count int, val int"
    )
    U.write_table(df, t)
    v0 = U.committed_versions(t)[-1]
    U.append_rows(spark, t, spark.createDataFrame([(3, 7)], "count int, val int"))
    U.restore(t, v0, spark=spark, key_cols=["count"])
    got = sorted(tuple(r) for r in U.read_table(spark, t).collect())
    assert got == [(1, 5), (2, 6)]


def test_rebucket_works_on_decontam_index(spark, tmp_path):
    """The decontam gram index commits through the same keyed machinery —
    incremental.rebucket re-seeds it and refreshes resume at the new
    count with identical check answers."""
    import spookystuff_spark.operators.decontam_index as D

    docs = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel"),
        (2, "one two three four five six seven eight nine"),
    ]
    probe = [(9, "alpha bravo charlie delta echo foxtrot golf hotel tail")]
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    U.write_table(
        spark.createDataFrame(docs, "doc_id long, text string"), src
    )
    D.build_decontam_index(spark, src, idx, n=4, n_buckets=4)
    pdf = spark.createDataFrame(probe, "doc_id long, text string")
    want = sorted(
        tuple(r) for r in D.decontam_check_df(spark, idx, pdf).collect()
    )
    assert want  # non-vacuous
    assert rebucket(spark, idx, 16) is not None
    assert sorted(
        tuple(r) for r in D.decontam_check_df(spark, idx, pdf).collect()
    ) == want
    U.delete_where(spark, src, F.col("doc_id") == 1)
    assert D.refresh_decontam_index(spark, src, idx) is not None
    assert (
        D.decontam_check_df(spark, idx, pdf).count() == 0
    )  # overlap source deleted


def test_rebucket_works_on_join_distinct_view(spark, tmp_path):
    """rebucket re-stamps the dual _SRCJ_ watermark verbatim, so the
    join-distinct support Z-set keeps folding exactly after a re-seed."""
    from spookystuff_spark.sources.incremental import read_distinct_aggregate
    from spookystuff_spark.sources.join_view import refresh_join_distinct

    a, b, dst = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "j")
    U.write_table(
        spark.createDataFrame(
            [(1, "s1", 10), (2, "s1", 20)], "id int, seg string, price long"
        ),
        a,
    )
    U.write_table(
        spark.createDataFrame([(1, "x"), (2, "y")], "id int, tag string"), b
    )
    refresh_join_distinct(
        spark, a, b, dst, ["id"], ["seg"], "price", dst_buckets=4
    )
    assert rebucket(spark, dst, 8) is not None
    U.append_rows(
        spark, a,
        spark.createDataFrame([(3, "s1", 20)], "id int, seg string, price long"),
    )
    U.append_rows(spark, b, spark.createDataFrame([(3, "z")], "id int, tag string"))
    assert refresh_join_distinct(
        spark, a, b, dst, ["id"], ["seg"], "price"
    ) is not None
    got = {
        (r["seg"], r["price_distinct"], r["n_rows"])
        for r in read_distinct_aggregate(spark, dst, ["seg"], "price").collect()
    }
    assert got == {("s1", 2, 3)}
