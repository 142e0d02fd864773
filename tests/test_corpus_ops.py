"""Unit tests for corpus-structure operators: global line dedup,
degree-ordered triangle counting, Z-order keys/clustering."""

from __future__ import annotations

import glob
import math

import duckdb
import pyspark.sql.functions as F
import pytest

from spookystuff_spark.operators.layout import zorder_key, zorder_sql, zorder_write
from spookystuff_spark.operators.lines import dedup_lines
from spookystuff_spark.operators.triangles import (
    copurchase_edges,
    triangle_stats,
)

# ------------------------------------------------------------------ lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_lines_keeps_first_occurrence(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha\nboiler\nbeta"),
            (2, "boiler\ngamma"),
            (3, "delta\nboiler"),
        ],
    )
    out = {r.doc_id: r for r in dedup_lines(docs).collect()}
    assert out[1].text_clean == "alpha\nboiler\nbeta"
    assert out[2].text_clean == "gamma"
    assert out[3].text_clean == "delta"
    assert (out[2].n_lines, out[2].n_kept, out[2].n_dropped) == (2, 1, 1)


def test_dedup_lines_blank_lines_are_structural(spark):
    docs = _docs(spark, [(1, "a\n\nb"), (2, "c\n\n\nd")])
    out = {r.doc_id: r for r in dedup_lines(docs).collect()}
    # every blank line survives; only content lines are deduped
    assert out[1].text_clean == "a\n\nb"
    assert out[2].text_clean == "c\n\n\nd"


def test_dedup_lines_trims_for_matching_but_keeps_original(spark):
    docs = _docs(spark, [(1, "  spaced  "), (2, "spaced")])
    out = {r.doc_id: r for r in dedup_lines(docs).collect()}
    assert out[1].text_clean == "  spaced  "  # first occurrence, original kept
    assert out[2].text_clean == ""


def test_dedup_lines_fully_deduped_doc_becomes_empty(spark):
    docs = _docs(spark, [(1, "x"), (2, "x")])
    out = {r.doc_id: r for r in dedup_lines(docs).collect()}
    assert out[2].text_clean == ""
    assert out[2].n_kept == 0


def test_dedup_lines_partition_invariant(spark):
    rows = [(i, f"common line\nunique {i}") for i in range(1, 40)]
    a = dedup_lines(_docs(spark, rows).repartition(2)).collect()
    b = dedup_lines(_docs(spark, rows).repartition(13)).collect()
    key = lambda r: r.doc_id
    assert sorted(a, key=key) == sorted(b, key=key)
    # doc 1 holds the (1, 0) first occurrence of the common line
    byid = {r.doc_id: r for r in a}
    assert byid[1].text_clean == "common line\nunique 1"
    assert byid[5].text_clean == "unique 5"


# -------------------------------------------------------------- triangles


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangle_stats_k4(spark):
    # complete graph on 4 nodes: C(4,3)=4 triangles, 4*C(3,2)=12 wedges
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = triangle_stats(_edges(spark, k4)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles, row.n_wedges) == (
        4, 6, 4, 12,
    )
    assert math.isclose(row.gcc, 1.0, abs_tol=1e-9)


def test_triangle_stats_path_has_none(spark):
    row = triangle_stats(_edges(spark, [(1, 2), (2, 3), (3, 4)])).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 2


def test_triangle_stats_two_sharing_an_edge(spark):
    # {1,2,3} and {2,3,4} share edge (2,3); skewed degrees exercise the
    # (deg, id) orientation tiebreak
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    row = triangle_stats(_edges(spark, edges)).collect()[0]
    assert row.n_triangles == 2
    # degrees 2,3,3,2 -> wedges 1+3+3+1
    assert row.n_wedges == 8


def test_copurchase_edges_from_baskets(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 30), (1, 20), (2, 10), (2, 30), (3, 99), (1, 10)],
        "l_orderkey long, l_partkey long",
    )
    got = sorted((r.a, r.b) for r in copurchase_edges(li).collect())
    assert got == [(10, 20), (10, 30), (20, 30)]


# ----------------------------------------------------------------- zorder


def test_zorder_key_interleave_known_values(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (65535, 0)], "x long, y long")
    out = df.select(zorder_key(["x", "y"], 16).alias("z")).collect()
    # x=0b11, y=0b01: bits of x at even-ish positions j=0 -> 2i, y at 2i+1
    # x contributes 1<<0 | 1<<2 = 5; y contributes 1<<1 = 2 -> 7
    assert [r.z for r in out] == [7, 0, sum(1 << (2 * i) for i in range(16))]


def test_zorder_sql_matches_spark(spark):
    rows = [(i * 37 % 113, i * 91 % 127) for i in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        r.z
        for r in df.select(zorder_key(["x", "y"], 16).alias("z"))
        .orderBy("z")
        .collect()
    ]
    con = duckdb.connect()
    con.sql("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = [
        r[0]
        for r in con.sql(
            f"SELECT {zorder_sql(['x', 'y'], 16)} AS z FROM t ORDER BY z"
        ).fetchall()
    ]
    assert got == exp


def test_zorder_key_overflow_guard():
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], 16)


def test_zorder_write_balances_pruning_across_dims(spark, tmp_path):
    # The property z-order buys: a selective filter on EITHER dimension can
    # prune most files on min-max stats. A single-column sort prunes
    # perfectly on that column and not at all on the other.
    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")

    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    df.repartitionByRange(16, "x").write.parquet(plain)
    zorder_write(df, ["x", "y"], zed, bits=8, num_files=16)

    def files_intersecting(path, col, lo, hi):
        k = 0
        for f in glob.glob(f"{path}/*.parquet"):
            mm = (
                spark.read.parquet(f)
                .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
                .collect()[0]
            )
            if mm.hi >= lo and mm.lo <= hi:
                k += 1
        return k

    n_plain = len(glob.glob(f"{plain}/*.parquet"))
    n_zed = len(glob.glob(f"{zed}/*.parquet"))
    # x-sorted layout: a y-filter touches EVERY file
    assert files_intersecting(plain, "y", 0, 7) == n_plain
    # z-ordered layout: a 12.5%-selective filter on either dim prunes at
    # least half the files (sampled range boundaries add +-1 file of slop)
    assert files_intersecting(zed, "x", 0, 7) <= n_zed // 2
    assert files_intersecting(zed, "y", 0, 7) <= n_zed // 2
    # and lossless
    got = spark.read.parquet(zed)
    assert got.count() == n * n
    assert got.distinct().count() == n * n


def test_dedup_lines_overflow_guard_raises(spark):
    """A doc_id beyond the 43-bit packing bound must fail LOUDLY, not
    silently pick a wrong first occurrence (ADVICE r4)."""
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    docs = _docs(
        spark,
        [(1 << 50, "dup line\nunique a"), (2, "dup line\nunique b")],
    )
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)) as ei:
        dedup_lines(docs).collect()
    assert "packing overflow" in str(ei.value)


def test_dedup_lines_guard_accepts_boundary(spark):
    """Max in-range doc_id (2^43 - 1) still works end-to-end."""
    big = (1 << 43) - 1
    docs = _docs(spark, [(big, "x\ny"), (1, "x\nz")])
    out = {r["doc_id"]: r["text_clean"] for r in dedup_lines(docs).collect()}
    # first occurrence of "x" belongs to the smaller packed value (doc 1)
    assert out[1] == "x\nz"
    assert out[big] == "y"
