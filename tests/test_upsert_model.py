"""Model-based property test for the versioned table: a random sequence of
upsert / delete / append / compact / clone operations must always agree with
a plain in-memory dict model, and every historical version must replay
exactly via time travel.

Hypothesis drives the op sequences; the Spark side is the implementation
under test, the dict is the executable spec. This is the strongest
correctness net for commit-protocol code: individual example tests check
states someone thought of, the model checks states nobody did.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

import pyspark.sql.functions as F

from spookystuff_spark.sources import upsert as U

KEYS = list(range(6))
VALS = ["a", "b", "c"]

op_st = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.sampled_from(VALS)),
            min_size=1,
            max_size=3,
            unique_by=lambda kv: kv[0],
        ),
    ),
    st.tuples(st.just("delete"), st.sampled_from(KEYS)),
    st.tuples(
        st.just("append"),
        st.tuples(st.integers(min_value=100, max_value=120), st.sampled_from(VALS)),
    ),
    st.tuples(st.just("compact"), st.none()),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_st, min_size=1, max_size=6))
def test_versioned_table_matches_dict_model(spark, tmp_path_factory, ops):
    tdir = str(tmp_path_factory.mktemp("model") / "t")
    model: dict[int, str] = {}
    history: list[tuple[str, dict[int, str]]] = []

    def mk(rows):
        return spark.createDataFrame(rows, "k int, v string")

    U.write_table(mk([(0, "init")]), tdir)
    model[0] = "init"
    history.append((U.committed_versions(tdir)[-1], dict(model)))

    for kind, arg in ops:
        if kind == "upsert":
            U.upsert(spark, tdir, mk(arg), ["k"])
            model.update(dict(arg))
        elif kind == "delete":
            U.delete_where(spark, tdir, F.col("k") == arg)
            model.pop(arg, None)
        elif kind == "append":
            # blind append of a fresh key (ids >= 100 never collide)
            k, v = arg
            if k in model:
                continue
            U.append_rows(spark, tdir, mk([(k, v)]))
            model[k] = v
        elif kind == "compact":
            U.compact(spark, tdir, num_files=2)
        history.append((U.committed_versions(tdir)[-1], dict(model)))

    # current state == model
    got = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got == set(model.items())

    # every committed version replays its historical state exactly
    for version, snapshot in history:
        rows = {
            (r["k"], r["v"])
            for r in U.read_table(spark, tdir, version).collect()
        }
        assert rows == set(snapshot.items()), f"time travel to {version}"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(0, 8), st.sampled_from(VALS)),
            min_size=1,
            max_size=3,
            unique_by=lambda kv: kv[0],
        ),
        min_size=1,
        max_size=4,
    )
)
def test_streaming_sink_replays_any_prefix(spark, tmp_path_factory, batches):
    """Exactly-once under arbitrary replays: after applying batches 0..n,
    re-delivering ANY prefix of them (the at-least-once failure mode) must
    leave the table bit-identical."""
    from spookystuff_spark.streaming.sink import streaming_upsert_sink

    tdir = str(tmp_path_factory.mktemp("sink") / "t")
    sink = streaming_upsert_sink(tdir, ["k"])

    def mk(rows):
        return spark.createDataFrame(rows, "k int, v string")

    model: dict[int, str] = {}
    for i, b in enumerate(batches):
        sink(mk(b), i)
        model.update(dict(b))
    before = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert before == set(model.items())

    n_versions = len(U.committed_versions(tdir))
    for i, b in enumerate(batches):  # replay everything, in order
        sink(mk(b), i)
    assert len(U.committed_versions(tdir)) == n_versions
    after = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert after == before
