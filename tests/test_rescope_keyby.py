"""keyby override, rescope-by-names pagination stitching, trajectory exprs,
JSON exit."""

from __future__ import annotations

import json

import pytest

from spookystuff_spark.actions import Mock, Trace, Wget
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.context import SpookyContext
from spookystuff_spark.functions.extractors import S, T


@pytest.fixture()
def sctx(spark):
    mem_cache.clear()
    return SpookyContext(spark)


def test_keyby_overrides_locality_group(sctx, spark, tmp_path):
    """Different URIs with the same keyby key share ONE agent run
    (ref: FetchPlan keyBy)."""
    (tmp_path / "x1.html").write_text("<html><title>X</title></html>")
    (tmp_path / "x2.html").write_text("<html><title>X</title></html>")
    df = spark.createDataFrame([{"f": "x1.html"}, {"f": "x2.html"}])

    def by_host(trace: Trace):
        return "same-host"  # collapse everything into one group

    fetched = sctx.create(df).fetch(Wget(f"file://{tmp_path}/{{f}}"), keyby=by_host)
    out = fetched.docs_df().collect()
    assert len(out) == 2
    # one group → one agent run → exactly one remote fetch (first trace wins)
    assert sctx.metrics.snapshot()["pages_from_remote"] == 1
    assert len({r.uri for r in out}) == 1


def test_rescope_by_distinct_names(sctx, spark):
    """Pagination stitching: repeated export names split into segments
    (ref: AgentRow.rescope.byDistinctNames)."""
    pages = [
        Mock(uri=f"mock://page{i}", content=f"<html><body>p{i}</body></html>".encode()).as_("page")
        for i in range(3)
    ]
    trace = Trace(tuple(pages))  # 3 exports, same name → 3 segments

    dv = sctx.create(spark.createDataFrame([{"k": 1}])).fetch(lambda row: trace)
    assert dv.count() == 1
    scoped = dv.rescope_by_distinct_names()
    rows = scoped.select(uri=S.uri).to_df().collect()
    assert len(rows) == 3
    assert sorted(r["__segment"] for r in scoped.df.collect()) == [0, 1, 2]
    assert sorted(r.uri for r in rows) == [
        "mock://page0",
        "mock://page1",
        "mock://page2",
    ]


def test_trajectory_exprs_multidoc(sctx, spark, tmp_path):
    (tmp_path / "ok.html").write_text("<html><title>ok</title></html>")

    def spec(row):
        return Trace(
            (
                Wget(f"file://{tmp_path}/ok.html"),
                Mock(uri="mock://p2", content=b"<html><body>2</body></html>"),
            )
        )

    out = (
        sctx.create(spark.createDataFrame([{"k": 1}]))
        .fetch(spec)
        .select(n=T.n_docs, ok=T.n_succeeded, bad=T.n_failed, uris=T.uris)
        .to_df()
        .collect()[0]
    )
    assert (out.n, out.ok, out.bad) == (2, 2, 0)
    assert len(out.uris) == 2


def test_trajectory_exprs_failure(sctx, spark, tmp_path):
    """Action failure aborts the trace (reference semantics) → one error obs."""
    out = (
        sctx.create(spark.createDataFrame([{"k": 1}]))
        .fetch(Wget(f"file://{tmp_path}/gone.html"))
        .select(n=T.n_docs, bad=T.n_failed, errs=T.errors)
        .to_df()
        .collect()[0]
    )
    assert (out.n, out.bad) == (1, 1)
    assert "FileNotFoundError" in out.errs[0]


def test_to_json_df(sctx, spark):
    dv = sctx.create(spark.createDataFrame([{"a": 1, "b": "x"}]))
    row = json.loads(dv.to_json_df().collect()[0].json)
    assert row == {"a": 1, "b": "x"}
