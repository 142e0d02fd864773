"""Edit-distance fuzzy join: q-gram block-and-verify vs brute force.

The q-gram design (ADVICE r4) makes recall EXHAUSTIVE when no block is
capped — including pairs sharing no whole token and sub-q-gram-length
strings — so brute force is compared over ALL pairs, unconditionally.
"""

from __future__ import annotations

import itertools

import pytest

from spookystuff_spark.operators.fuzzy import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


NAMES = [
    (1, "acme corporation"),
    (2, "acme corporatian"),   # 1 substitution from 1
    (3, "acme corp"),          # far from 1 (7 deletions)
    (4, "globex company"),
    (5, "globex compny"),      # 1 deletion from 4
    (6, "globex kompany"),     # 1 substitution from 4, 2 from 5
    (7, "initech"),
    (8, "intech"),             # no shared TOKEN with 7 — q-grams catch it
    (9, "umbrella corporation"),
    (10, "acme corporation"),  # exact duplicate of 1
    (11, "hello"),
    (12, "hallo"),             # the ADVICE r4 counterexample, dist 1
    (13, "ab"),                # sub-q-gram-guarantee lengths:
    (14, "ba"),                # dist(ab, ba) = 2 via length-band keys
    (15, "a"),                 # dist(a, ab) = 1, dist(a, ba) = 1
]


def _brute(max_dist):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(NAMES, 2):
        if _lev(sa, sb) <= max_dist:
            out.add((ia, ib, _lev(sa, sb)))
    return out


def test_matches_bruteforce_over_all_pairs(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    pairs, dropped = edit_distance_pairs(df, "id", "name", max_dist=2)
    got = {(r.id_a, r.id_b, r.dist) for r in pairs.collect()}
    assert dropped == 0
    assert got == _brute(2)
    # the crafted cases: whole-token blocking missed 7-8 and 11-12; short
    # strings have no guaranteed shared bigram at all
    assert (7, 8, 1) in got
    assert (11, 12, 1) in got
    assert (13, 14, 2) in got and (13, 15, 1) in got and (14, 15, 1) in got
    assert (1, 2, 1) in got and (4, 5, 1) in got and (1, 10, 0) in got
    assert (5, 6, 2) in got


def test_hot_block_cap_drops_loudly(spark):
    rows = [(i, f"inc entity{i:02d}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, name string")
    # every bigram of the shared "inc entity" prefix occurs in all 50 names
    # -> oversized under max_block=10 and dropped with a count; precision
    # stays exact (result is a subset of brute force)
    pairs, dropped = edit_distance_pairs(df, "id", "name", max_dist=2, max_block=10)
    assert dropped > 0
    brute = {
        (a, b)
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= 2
    }
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got <= brute


def test_uncapped_is_exhaustive_even_with_hot_prefix(spark):
    rows = [(i, f"inc entity{i:02d}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs, dropped = edit_distance_pairs(df, "id", "name", max_dist=2)
    assert dropped == 0
    brute = {
        (a, b, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= 2
    }
    assert {(r.id_a, r.id_b, r.dist) for r in pairs.collect()} == brute


def test_partition_layout_invariant(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    a, _ = edit_distance_pairs(df.repartition(2), "id", "name", max_dist=2)
    b, _ = edit_distance_pairs(df.repartition(7), "id", "name", max_dist=2)
    key = lambda r: (r.id_a, r.id_b)
    assert sorted(a.collect(), key=key) == sorted(b.collect(), key=key)
