"""Property-based tests for trace canonicalization (hypothesis) — the
invariants the whole dedup/caching machinery rests on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spookystuff_spark.actions import (
    Delay,
    Loop,
    Mock,
    RandomDelay,
    Trace,
    Wget,
    Wpost,
    trace_from_json,
)

action_st = st.one_of(
    st.builds(Wget, uri=st.text(max_size=30)),
    st.builds(Wpost, uri=st.text(max_size=20), entity=st.text(max_size=20)),
    st.builds(Delay, seconds=st.floats(0, 10, allow_nan=False)),
    st.builds(RandomDelay, min_seconds=st.floats(0, 5, allow_nan=False)),
    st.builds(
        Mock,
        uri=st.text(max_size=20),
        content=st.binary(max_size=50),
        mime=st.sampled_from(["text/html", "application/json", "text/plain"]),
    ),
)

trace_st = st.lists(action_st, max_size=6).map(lambda xs: Trace(tuple(xs)))


@given(trace_st)
@settings(max_examples=200, deadline=None)
def test_json_roundtrip_preserves_identity(t):
    rt = trace_from_json(t.to_json())
    assert rt == t
    assert rt.key == t.key


@given(trace_st)
@settings(max_examples=200, deadline=None)
def test_delays_never_affect_key(t):
    with_delays = Trace(())
    for a in t.actions:
        with_delays = with_delays + Delay(0.123) + a
    with_delays = with_delays + RandomDelay(0.1, 0.2)
    assert with_delays.key == t.key


@given(trace_st)
@settings(max_examples=200, deadline=None)
def test_dry_run_covers_every_export(t):
    bts = t.dry_run()
    n_exports = sum(
        1 for a in t.actions if a.HAS_EXPORT or a.children().has_export
    )
    assert len(bts) == n_exports
    for bt in bts:
        assert bt.actions[-1].HAS_EXPORT or bt.actions[-1].children().has_export
        # every non-terminal action in a backtrace is state-changing
        assert all(a.MAY_CHANGE_STATE for a in bt.actions[:-1])


@given(trace_st, trace_st)
@settings(max_examples=100, deadline=None)
def test_key_discriminates_canonical_traces(t1, t2):
    if t1.canonical != t2.canonical:
        assert t1.key != t2.key
    else:
        assert t1.key == t2.key


@given(st.lists(action_st, min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_loop_propagates_flags(actions):
    body = Trace(tuple(actions))
    loop = Loop(body, limit=2)
    assert loop.HAS_EXPORT == body.has_export
    assert loop.MAY_CHANGE_STATE == any(a.MAY_CHANGE_STATE for a in body)
