"""Property model for SCD-2 (operators/scd.py): random evolution
sequences folded through scd2_upsert must match a trivial pure-Python
replay — version intervals, current rows, no-op collapsing, and as-of
lookups at arbitrary instants."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

import pyspark.sql.functions as F
from spookystuff_spark.operators.scd import asof_join_scd2, scd2_upsert
from spookystuff_spark.sources import upsert as U

# a batch: {key: attr} observed at the next timestamp tick
batch_st = st.dictionaries(
    st.integers(min_value=1, max_value=5),
    st.sampled_from(["a", "b", "c"]),
    min_size=1,
    max_size=4,
)


def _replay(batches):
    """Pure-Python SCD-2: {key: [(attr, valid_from, valid_to|None), ...]}."""
    hist: dict[int, list] = {}
    for ts, batch in enumerate(batches, start=1):
        for k, attr in sorted(batch.items()):
            versions = hist.setdefault(k, [])
            if versions and versions[-1][0] == attr:
                continue  # attr-identical: no-op
            if versions:
                a, vf, _ = versions[-1]
                versions[-1] = (a, vf, ts)
            versions.append((attr, ts, None))
    return hist


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch_st, min_size=1, max_size=5))
def test_scd2_matches_python_replay(spark, tmp_path_factory, batches):
    d = str(tmp_path_factory.mktemp("scdprop") / "dim")
    for ts, batch in enumerate(batches, start=1):
        df = spark.createDataFrame(
            [(k, a, ts) for k, a in sorted(batch.items())],
            "k long, attr string, effective_ts long",
        )
        scd2_upsert(spark, d, df, ["k"])
    got = {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"])
        for r in U.read_table(spark, d).collect()
    }
    want = {
        (k, a, vf, vt)
        for k, versions in _replay(batches).items()
        for a, vf, vt in versions
    }
    assert got == want

    # as-of lookups at every tick match the replay's interval arithmetic
    max_ts = len(batches)
    facts = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(
            (k, t) for k in range(1, 6) for t in range(1, max_ts + 1)
        )],
        "fact_id long, k long, ts long",
    )
    labeled = {
        (r["k"], r["ts"]): r["attr"]
        for r in asof_join_scd2(
            facts, U.read_table(spark, d), ["k"], "ts"
        ).collect()
    }
    expect = {}
    for k, versions in _replay(batches).items():
        for t in range(1, max_ts + 1):
            for a, vf, vt in versions:
                if vf <= t and (vt is None or t < vt):
                    expect[(k, t)] = a
    assert labeled == expect
