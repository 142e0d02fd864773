"""Property tests (hypothesis) for corpus-structure operators: the Spark
implementation must agree with a pure-Python reference of the same spec on
randomized inputs, not just curated examples."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spookystuff_spark.operators.layout import zorder_key
from spookystuff_spark.operators.lines import dedup_lines

# small alphabet so cross-doc line collisions are common
_LINE = st.sampled_from(["alpha", "beta", "gamma", " beta ", "", "  ", "x y"])
_DOC = st.lists(_LINE, min_size=0, max_size=6).map(lambda ls: "\n".join(ls))
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _ref_dedup_lines(texts: list[str]) -> dict[int, tuple[str, int, int]]:
    """Pure-Python reference of the documented spec: first corpus-wide
    occurrence by (doc_id, line_no) of each trimmed non-empty line wins;
    blank lines always kept."""
    first: dict[str, tuple[int, int]] = {}
    for did, text in enumerate(texts):
        for no, line in enumerate(text.split("\n")):
            key = line.strip()
            if len(key) >= 1 and key not in first:
                first[key] = (did, no)
    out = {}
    for did, text in enumerate(texts):
        lines = text.split("\n")
        kept = [
            line
            for no, line in enumerate(lines)
            if len(line.strip()) < 1 or first[line.strip()] == (did, no)
        ]
        out[did] = ("\n".join(kept), len(lines), len(kept))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_dedup_lines_matches_reference(spark, corpus):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text_clean, r.n_lines, r.n_kept)
        for r in dedup_lines(df).collect()
    }
    assert got == _ref_dedup_lines(corpus)


def _ref_z(x: int, y: int, bits: int) -> int:
    mask = (1 << bits) - 1
    x, y = x & mask, y & mask
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 20)),
            st.integers(min_value=0, max_value=(1 << 20)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_zorder_key_matches_reference_bijection(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long")
    got = [r.z for r in df.select(zorder_key(["x", "y"], 16).alias("z")).collect()]
    assert sorted(got) == sorted(_ref_z(x, y, 16) for x, y in pts)
    # bijection within the masked domain: distinct masked points, distinct keys
    masked = {(x & 0xFFFF, y & 0xFFFF) for x, y in pts}
    assert len(set(got)) == len(masked)
