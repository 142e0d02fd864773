"""Cross-engine-stable rounding.

Spark's ``round`` on doubles goes through the shortest decimal string
(BigDecimal.valueOf → HALF_UP) while DuckDB rounds the scaled binary value, so
an average that lands exactly on a tie (e.g. 40.55/2 = 20.275) rounds to 20.28
on Spark and 20.27 on DuckDB. ``round_stable`` shifts the value by +1e-6 before
rounding — ties (which arise only from low-decimal arithmetic, i.e. sit exactly
on the boundary) resolve upward on both engines, while values farther than 1e-6
from a boundary are untouched. The oracle SQL must apply the same shift; use
``oracle_round``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

EPS = 1e-6


def round_stable(col: Column, scale: int) -> Column:
    return F.round(col + F.lit(EPS), scale)


def oracle_round(expr: str, scale: int) -> str:
    return f"round(({expr}) + 1e-6, {scale})"
