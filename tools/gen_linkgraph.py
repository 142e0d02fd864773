#!/usr/bin/env python3
"""Deterministic file:// link-graph fixture + golden oracle for the agent
ExplorePlan (plans/explore.py) — the fetch-driven BFS itself, not its
relational twin.

Pages ``p0.html .. p{N-1}.html`` under fixtures/linkgraph/ with a closed-form
edge rule (binary-tree edges + a modular cross edge → diamonds, duplicate
links, and a cycle-free-but-reconverging shape). The golden parquet is the
independent pure-python BFS closure with the reference's PathPlanning
semantics (ExploreIT.scala:23-67, PathPlanning_Simple.scala:24-78): per node
the minimum ``(depth, path)`` — path compared lexicographically, ordinal =
last link index of the winning path, seed ordinal = NULL.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRAPH_DIR = os.path.join(REPO, "fixtures", "linkgraph")
GOLD_DIR = os.path.join(REPO, "fixtures", "golden", "sf0.01")

N = 20
MAX_DEPTH = 3


def links(i: int, n: int = N) -> list[int]:
    """Closed-form out-edges of page i (order = ordinal indices; duplicates
    and self-loops are possible by construction and must be handled by the
    engine's trace dedup)."""
    out = []
    for j in (2 * i + 1, 2 * i + 2, (7 * i + 3) % n):
        if j < n:
            out.append(j)
    return out


def write_pages() -> None:
    os.makedirs(GRAPH_DIR, exist_ok=True)
    for i in range(N):
        anchors = "".join(
            f'<a href="p{j}.html">to {j}</a>' for j in links(i)
        )
        body = (
            f"<html><head><title>page {i}</title></head>"
            f"<body><h1>p{i}</h1>{anchors}</body></html>"
        )
        with open(os.path.join(GRAPH_DIR, f"p{i}.html"), "w") as f:
            f.write(body)
    print(f"wrote {N} pages to {GRAPH_DIR}")


def bfs_golden() -> list[tuple[str, int, int | None]]:
    """Min-(depth, path) BFS from p0; path = list of link ordinals; a node's
    winning path at depth d is min over (parent_best_path + [link_idx])."""
    best: dict[int, tuple[int, tuple[int, ...]]] = {0: (0, ())}
    frontier = {0: ()}
    for depth in range(1, MAX_DEPTH + 1):
        candidates: dict[int, tuple[int, ...]] = {}
        for node, path in frontier.items():
            for idx, child in enumerate(links(node)):
                # self-loops produce a trace whose key equals an already-
                # visited node; the anti-join drops it — same as any revisit
                cand = path + (idx,)
                if child in candidates:
                    candidates[child] = min(candidates[child], cand)
                else:
                    candidates[child] = cand
        frontier = {
            n: p for n, p in candidates.items() if n not in best
        }
        for n, p in frontier.items():
            best[n] = (depth, p)
        if not frontier:
            break
    rows = []
    for n in sorted(best):
        depth, path = best[n]
        ordinal = path[-1] if path else None
        rows.append((f"p{n}.html", depth, ordinal))
    return rows


def main() -> None:
    write_pages()
    rows = bfs_golden()
    os.makedirs(GOLD_DIR, exist_ok=True)
    table = pa.table(
        {
            "page": pa.array([r[0] for r in rows], pa.string()),
            "depth": pa.array([r[1] for r in rows], pa.int32()),
            "ordinal": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    path = os.path.join(GOLD_DIR, "q_explore_agent_linkgraph.parquet")
    pq.write_table(table, path)
    print(f"wrote {path}: {table.num_rows} rows")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
