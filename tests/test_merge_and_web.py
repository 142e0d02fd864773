"""Record-merge policy tests (model: dsl/RecInterfaceSpec.scala:10-101) and
web-action algebra tests (selenium absent → trace machinery must still work,
execution must fail as data)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.context import SpookyContext


@pytest.fixture()
def dv(spark):
    return SpookyContext(spark).create(
        spark.createDataFrame([{"a": 1, "b": "x"}, {"a": 2, "b": None}])
    )


def test_merge_error_policy(dv):
    with pytest.raises(ValueError, match="merge policy 'error'"):
        dv.with_columns_merged("error", b=F.lit("new"))
    out = dv.with_columns_merged("error", c=F.lit("new")).to_df()
    assert set(out.columns) == {"a", "b", "c"}


def test_merge_prefer_right_and_left(dv):
    right = dv.with_columns_merged("prefer_right", b=F.lit("R")).to_df().collect()
    assert all(r.b == "R" for r in right)
    left = dv.with_columns_merged("prefer_left", b=F.lit("R")).to_df().collect()
    assert sorted(r.b for r in left if r.b) == ["x"]


def test_merge_replace_if_not_null(dv):
    out = (
        dv.with_columns_merged(
            "replace_if_not_null",
            b=F.when(F.col("a") == 2, F.lit("filled")),
        )
        .to_df()
        .collect()
    )
    got = {r.a: r.b for r in out}
    assert got == {1: "x", 2: "filled"}  # null new value keeps old, null old filled


def test_explode_field(spark):
    dv = SpookyContext(spark).create(
        spark.createDataFrame([{"k": 1, "vals": [10, 20]}, {"k": 2, "vals": []}])
    )
    rows = sorted(
        (r.k, r.vals) for r in dv.explode_field("vals").to_df().collect()
    )
    assert rows == [(1, 10), (1, 20), (2, None)]  # explode_outer keeps empty


def test_web_actions_trace_algebra():
    """Trace composition/serialization/keys work without selenium."""
    from spookystuff_spark.actions import Trace, trace_from_json
    from spookystuff_spark.actions.web import (
        Click,
        Snapshot,
        TextInput,
        Visit,
        WaitFor,
    )

    t = (
        Visit("http://example.com")
        + WaitFor("body")
        + TextInput("#q", "spark")
        + Click("#go")
        + Snapshot()
    )
    assert isinstance(t, Trace)
    assert t.has_export  # Snapshot exports
    rt = trace_from_json(t.to_json())
    assert rt == t and rt.key == t.key
    # WaitFor is read-only → pruned from canonical key
    t2 = Visit("http://example.com") + TextInput("#q", "spark") + Click("#go") + Snapshot()
    assert t2.key == t.key
    # dry-run backtrace for Snapshot includes all state-changing steps
    bts = t.dry_run()
    assert len(bts) == 1
    assert [type(a).__name__ for a in bts[0]] == [
        "Visit",
        "TextInput",
        "Click",
        "Snapshot",
    ]


def test_web_execution_fails_as_data():
    from spookystuff_spark.actions import fetch_trace
    from spookystuff_spark.actions.web import Snapshot, Visit
    from spookystuff_spark.conf import SpookyConf

    obs = fetch_trace(
        (Visit("http://x") + Snapshot()),
        SpookyConf(fetch_retries=1, retry_delay_sec=0),
    )
    assert len(obs) == 1
    assert not obs[0].success
    assert "selenium" in obs[0].error
