"""SUITE_CONSTITUENTS honesty: the statically declared suite→constituent
maps bench.py publishes must match the melt rows the suites actually emit
(observed ⊆ declared — a constituent may be empty at tiny SF), and every
mapped bench name must resolve to a registered query."""

from __future__ import annotations

import pytest

from spookystuff_spark.queries import (
    EXTRA_BENCH,
    QUERIES,
    SUITE_CONSTITUENTS,
    load_all_query_modules,
)

load_all_query_modules()


def test_declared_names_resolve():
    assert len(SUITE_CONSTITUENTS) >= 7
    for suite, mapping in SUITE_CONSTITUENTS.items():
        assert suite in QUERIES, f"{suite} is not a gated query"
        for alias, bench in mapping.items():
            if bench is not None:
                assert (
                    bench in EXTRA_BENCH or bench in QUERIES
                ), f"{suite}:{alias} -> {bench} is not a benched query"


@pytest.mark.parametrize("suite", sorted(SUITE_CONSTITUENTS))
def test_observed_constituents_are_declared(spark, suite):
    df = QUERIES[suite](spark, "/root/testdata/sf0.001")
    assert "q" in df.columns, f"{suite} melt has no q column"
    observed = {r[0] for r in df.select("q").distinct().collect()}
    declared = set(SUITE_CONSTITUENTS[suite])
    assert observed <= declared, (
        f"{suite} emits undeclared constituents: {observed - declared}"
    )
    # the declared map can only exceed observed by SF-empty constituents;
    # require most of it to show up even at the smallest SF
    assert len(observed) >= len(declared) - 3
