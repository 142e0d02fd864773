"""Edit-distance fuzzy join: block-and-verify vs brute-force reference."""

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
    (3, "acme corp"),          # far from 1 (6 deletions)
    (4, "globex company"),
    (5, "globex compny"),      # 1 deletion from 4
    (6, "globex kompany"),     # 1 substitution from 4, 2 from 5
    (7, "initech"),
    (8, "intech"),             # shares no TOKEN with 7 -> blocking miss
    (9, "umbrella corporation"),
    (10, "acme corporation"),  # exact duplicate of 1
]


def _brute(max_dist):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(NAMES, 2):
        # reference includes only token-sharing pairs (the operator's
        # documented recall contract)
        if set(sa.split()) & set(sb.split()) and _lev(sa, sb) <= max_dist:
            out.add((ia, ib, _lev(sa, sb)))
    return out


def test_matches_bruteforce_over_token_sharing_pairs(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    pairs, dropped = edit_distance_pairs(df, "id", "name", max_dist=2)
    got = {(r.id_a, r.id_b, r.dist) for r in pairs.collect()}
    assert dropped == 0
    assert got == _brute(2)
    # sanity on the crafted cases
    assert (1, 2, 1) in got and (4, 5, 1) in got and (1, 10, 0) in got
    assert (5, 6, 2) in got
    assert not any(p[:2] == (7, 8) for p in got)  # documented blocking miss


def test_hot_block_cap_drops_loudly(spark):
    rows = [(i, f"inc entity{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, name string")
    # "inc" appears in all 50 names -> oversized under max_block=10;
    # "entityN" tokens are unique -> no surviving blocks at all
    pairs, dropped = edit_distance_pairs(df, "id", "name", max_dist=2, max_block=10)
    assert dropped == 1
    assert pairs.count() == 0


def test_partition_layout_invariant(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    a, _ = edit_distance_pairs(df.repartition(2), "id", "name", max_dist=2)
    b, _ = edit_distance_pairs(df.repartition(7), "id", "name", max_dist=2)
    key = lambda r: (r.id_a, r.id_b)
    assert sorted(a.collect(), key=key) == sorted(b.collect(), key=key)
