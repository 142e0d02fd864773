"""FetchPlan + select/fork DataFrame tests (model: execution/FetchPlanSpec.scala
fetch-once metric counting :33-52, FlatMapPlanSpec exact outputs :19-55)."""

from __future__ import annotations

import pytest

from spookystuff_spark.actions import Wget
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.context import SpookyContext
from spookystuff_spark.functions.extractors import C, S
from pyspark.sql.types import LongType


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    d = tmp_path_factory.mktemp("site")
    (d / "index.html").write_text(
        "<html><head><title>Index</title></head><body>"
        '<ul><li class="item"><a href="a.html">A</a><span>first</span></li>'
        '<li class="item"><a href="b.html">B</a><span>second</span></li></ul>'
        "</body></html>"
    )
    (d / "a.html").write_text(
        "<html><head><title>Page A</title></head><body><h1>A</h1>"
        '<a class="next" href="c.html">C</a></body></html>'
    )
    (d / "b.html").write_text(
        "<html><head><title>Page B</title></head><body><h1>B</h1>"
        '<a class="next" href="c.html">C</a></body></html>'
    )
    (d / "c.html").write_text(
        "<html><head><title>Page C</title></head><body><h1>C</h1></body></html>"
    )
    return d


@pytest.fixture()
def sctx(spark):
    mem_cache.clear()
    return SpookyContext(spark)


def test_template_fetch_native_and_dedup(sctx, spark, site):
    """Duplicate URIs fetch once — the reference's core efficiency invariant
    (FetchPlanSpec.scala:33-52: pagesFetched counts)."""
    rows = [{"page": "a.html"}, {"page": "b.html"}, {"page": "a.html"}]
    dv = sctx.create(spark.createDataFrame(rows))
    fetched = dv.fetch(Wget(f"file://{site}/{{page}}"))
    out = fetched.select(title=S("title").text).to_df().collect()
    titles = sorted((r.page, r.title) for r in out)
    assert titles == [
        ("a.html", "Page A"),
        ("a.html", "Page A"),
        ("b.html", "Page B"),
    ]
    m = sctx.metrics.snapshot()
    assert m["pages_from_remote"] == 2  # a.html + b.html, NOT 3
    assert m["pages_fetched"] == 2  # one agent run per unique trace


def test_fetch_plan_is_native_until_shuffle(sctx, spark, site):
    """Template fetch: trace construction must be JVM-native (no Python stage
    before the dedup shuffle) — check the physical plan."""
    dv = sctx.create(spark.createDataFrame([{"page": "a.html"}]))
    from spookystuff_spark.plans.fetch import attach_traces

    df = attach_traces(dv.df, Wget(f"file://{site}/{{page}}"), sctx.ctx_conf if hasattr(sctx, "ctx_conf") else sctx.conf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" not in plan  # pure project over the scan


def test_callable_spec_one_to_many(sctx, spark, site):
    """1→N fetch: a callable returning a TraceSet explodes the row
    (ref: CanFetch._onCollection)."""
    dv = sctx.create(spark.createDataFrame([{"seed": "x"}]))

    def spec(row):
        return [Wget(f"file://{site}/a.html"), Wget(f"file://{site}/b.html")]

    out = (
        dv.fetch(spec)
        .select(title=S("title").text)
        .to_df()
        .collect()
    )
    assert sorted(r.title for r in out) == ["Page A", "Page B"]
    assert all(r.seed == "x" for r in out)


def test_warm_cache_zero_remote(spark, site, tmp_path):
    """Second identical fetch is all-cache (ITBaseSpec.scala:95-96).

    Needs the DFS cache level: the executor-memory cache is per Python worker,
    and Spark may schedule the second job on a different worker — exactly the
    multi-executor situation the shared DFS cache exists for."""
    from spookystuff_spark.conf import SpookyConf

    mem_cache.clear()
    sctx = SpookyContext(spark, SpookyConf(dfs_cache_root=str(tmp_path / "dfs")))
    # a test-unique page: worker-side memory caches persist across tests, so a
    # shared fixture URI could already be warm in some worker
    (tmp_path / "warm.html").write_text("<html><title>W</title></html>")
    site = tmp_path
    df = spark.createDataFrame([{"page": "warm.html"}])
    sctx.create(df).fetch(Wget(f"file://{site}/{{page}}")).execute()
    before = sctx.metrics.snapshot()["pages_from_remote"]
    assert before == 1
    sctx.create(df).fetch(Wget(f"file://{site}/{{page}}")).execute()
    after = sctx.metrics.snapshot()
    assert after["pages_from_remote"] == before  # zero new remote fetches
    assert after["pages_from_cache"] >= 1


def test_select_multiple_extractors_and_column_ref(sctx, spark, site):
    dv = sctx.create(spark.createDataFrame([{"page": "index.html"}]))
    out = (
        dv.fetch(Wget(f"file://{site}/{{page}}"))
        .select(
            title=S("title").text,
            links=S("li a").hrefs,
            n_items=S("li.item").size,
            page_again=C("page"),
        )
        .to_df()
        .collect()[0]
    )
    assert out.title == "Index"
    assert out.n_items == 2
    assert [h.rsplit("/", 1)[-1] for h in out.links] == ["a.html", "b.html"]
    assert out.page_again == "index.html"


def test_select_conflict_raises(sctx, spark, site):
    dv = sctx.create(spark.createDataFrame([{"page": "a.html"}]))
    fetched = dv.fetch(Wget(f"file://{site}/{{page}}"))
    with pytest.raises(ValueError, match="already exists"):
        fetched.select(page=S("title").text)


def test_fork_explode_with_ordinal(sctx, spark, site):
    """fork = per-element explode preserving parent (ForkExtractIT.scala:18-50)."""
    dv = sctx.create(spark.createDataFrame([{"page": "index.html"}]))
    out = (
        dv.fetch(Wget(f"file://{site}/{{page}}"))
        .fork("li.item", ordinal_field="ordinal")
        .select(label=S("a").text, note=S("span").text)
        .to_df()
        .collect()
    )
    got = sorted((r.ordinal, r.label, r.note, r.page) for r in out)
    assert got == [
        (0, "A", "first", "index.html"),
        (1, "B", "second", "index.html"),
    ]


def test_docs_df_schema(sctx, spark, site):
    dv = sctx.create(spark.createDataFrame([{"page": "a.html"}]))
    docs = dv.fetch(Wget(f"file://{site}/{{page}}")).docs_df()
    rows = docs.collect()
    assert len(rows) == 1
    assert rows[0].mime.startswith("text/html")
    assert rows[0].success
    assert rows[0].uid


def test_narrow_locality_no_shuffle(sctx, spark, site):
    dv = sctx.create(spark.createDataFrame([{"page": "a.html"}, {"page": "a.html"}]))
    fetched = dv.fetch(Wget(f"file://{site}/{{page}}"), locality="narrow")
    plan = fetched.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side only
    out = fetched.select(title=S("title").text).to_df().collect()
    assert [r.title for r in out] == ["Page A", "Page A"]


def test_downsampling_first_n(sctx, spark, site):
    dv = sctx.create(
        spark.createDataFrame([{"page": "a.html"}, {"page": "a.html"}, {"page": "a.html"}])
    )
    fetched = dv.fetch(Wget(f"file://{site}/{{page}}"), downsampling=("first_n", 1))
    assert fetched.count() == 1  # LIMIT-per-group (DownSampling.FirstN)


def test_error_rows_are_data(sctx, spark, site):
    dv = sctx.create(spark.createDataFrame([{"page": "missing.html"}]))
    fetched = dv.fetch(Wget(f"file://{site}/{{page}}"))
    docs = fetched.docs_df().collect()
    assert len(docs) == 1
    assert not docs[0].success
    assert "FileNotFoundError" in docs[0].error
    # select over an error row yields nulls, not exceptions
    out = fetched.select(title=S("title").text).to_df().collect()
    assert out[0].title is None


def test_wide_join_locality_equivalent(sctx, spark, site):
    """wide_join (dedup-then-join: user columns stay out of the fetch
    shuffle) must produce the same rows and the same fetch counts as wide."""
    rows = [{"page": "a.html", "payload": f"wide-user-data-{i}"} for i in range(6)]
    rows += [{"page": "b.html", "payload": "x"}]
    df = spark.createDataFrame(rows)

    out = (
        sctx.create(df)
        .fetch(Wget(f"file://{site}/{{page}}"), locality="wide_join")
        .select(title=S("title").text)
        .to_df()
        .collect()
    )
    assert len(out) == 7
    titles = {r.page: r.title for r in out}
    assert titles == {"a.html": "Page A", "b.html": "Page B"}
    m = sctx.metrics.snapshot()
    assert m["pages_fetched"] == 2  # one agent run per unique trace

    # the agent stage must consume only the distinct (key, trace) projection —
    # user columns stay out of the fetch path entirely
    fetched = sctx.create(df).fetch(
        Wget(f"file://{site}/{{page}}"), locality="wide_join"
    )
    plan = fetched.df._jdf.queryExecution().executedPlan().toString()
    pandas_input = plan.split("MapInPandas")[1]
    assert "payload" not in pandas_input.split("Scan")[0]
    # downsampling is a per-group-batch concept — must be rejected here
    import pytest as _pytest

    with _pytest.raises(ValueError, match="downsampling"):
        sctx.create(df).fetch(
            Wget(f"file://{site}/{{page}}"),
            locality="wide_join",
            downsampling=("first_n", 1),
        )


def test_template_with_literal_percent(sctx, spark, site):
    """A literal '%' in a URI template must survive format_string: it is
    escaped to '%%' BEFORE '{col}' substitution, so a percent-encoded
    template like 'a%20{suffix}' is not parsed as a java format conversion
    (ADVICE r01: the old post-substitution replace missed single '%')."""
    import shutil

    shutil.copy(site / "a.html", site / "a b.html")  # fetched as 'a%20b.html'
    dv = sctx.create(spark.createDataFrame([{"suffix": "b.html"}]))
    # '%20' sits in the TEMPLATE, '{suffix}' forces the format_string path
    fetched = dv.fetch(Wget(f"file://{site}/a%20" + "{suffix}"))
    out = fetched.select(title=S("title").text).to_df().collect()
    assert [r.title for r in out] == ["Page A"]
