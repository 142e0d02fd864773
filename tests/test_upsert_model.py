"""Model-based property test for the versioned table: a random sequence of
upsert / delete / DV-delete / append / compact / restore operations must
always agree with a plain in-memory dict model, and every historical version must replay
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
    st.tuples(st.just("delete_dv"), st.sampled_from(KEYS)),
    st.tuples(
        st.just("append"),
        st.tuples(st.integers(min_value=100, max_value=120), st.sampled_from(VALS)),
    ),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("restore"), st.integers(min_value=0, max_value=100)),
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
        elif kind == "delete_dv":
            # merge-on-read: same observable semantics, metadata-only commit
            U.delete_where_dv(spark, tdir, F.col("k") == arg, ["k"])
            model.pop(arg, None)
        elif kind == "restore":
            target_v, target_snap = history[arg % len(history)]
            U.restore(tdir, target_v)
            model = dict(target_snap)
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


part_op_st = st.one_of(
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.sampled_from(VALS)),
            min_size=1,
            max_size=3,
            unique_by=lambda kv: kv[0],
        ),
    ),
    st.tuples(st.just("delete_dv"), st.sampled_from(KEYS)),
    st.tuples(st.just("compact"), st.none()),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(part_op_st, min_size=1, max_size=5))
def test_partitioned_table_matches_dict_model(spark, tmp_path_factory, ops):
    """The DV-composing partitioned MERGE against the executable dict spec:
    any interleaving of touched-slice merges, key-vector deletes and
    layout-preserving compactions must agree with the model through BOTH
    the snapshot reader and the partition-pruned reader."""
    from spookystuff_spark.sources.partitioned_table import (
        compact_partitioned,
        read_table_partitions,
        upsert_partitioned,
        write_table_partitioned,
    )

    def grp(k: int) -> str:  # partition stability: key → fixed partition
        return f"p{k % 3}"

    def mk(rows):
        return spark.createDataFrame(
            [(k, grp(k), v) for k, v in rows], "k int, grp string, v string"
        )

    tdir = str(tmp_path_factory.mktemp("pmodel") / "t")
    model: dict[int, str] = {0: "init"}
    write_table_partitioned(mk([(0, "init")]), tdir, "grp")

    for kind, arg in ops:
        if kind == "merge":
            upsert_partitioned(spark, tdir, mk(arg), ["k"], "grp")
            model.update(dict(arg))
        elif kind == "delete_dv":
            U.delete_where_dv(spark, tdir, F.col("k") == arg, ["k"])
            model.pop(arg, None)
        elif kind == "compact":
            compact_partitioned(spark, tdir, "grp")

    expect = {(k, grp(k), v) for k, v in model.items()}
    got = {
        (r["k"], r["grp"], r["v"])
        for r in U.read_table(spark, tdir).collect()
    }
    assert got == expect
    pruned = {
        (r["k"], r["grp"], r["v"])
        for r in read_table_partitions(
            spark, tdir, ["p0", "p1", "p2"]
        ).collect()
    }
    assert pruned == expect
