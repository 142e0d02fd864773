"""Queries exercising the engine's own operators (explore BFS, near-dup LSH,
fetch) rather than plain relational algebra. Registered incrementally as the
operators land; non-SQL-expressible ones omit the oracle (rows-only check).
"""

from __future__ import annotations
