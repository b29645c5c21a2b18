"""Cross-engine numeric stabilization helpers.

Round-6 driver red (`heaps_fit`): a rounded regression aggregate over
a degenerate input (constant y ⇒ the slope is a catastrophic
cancellation around zero) came out `+0.0` on Spark but flapped
between `+0.0` and `-0.0` across identical DuckDB runs — and the
driver's value digest distinguishes signed zeros. IEEE 754 gives the
two-character fix: `-0.0 + 0.0 == +0.0` (round-to-nearest addition of
opposite-signed zeros is defined to return +0), so appending `+ 0.0`
AFTER the round canonicalizes the sign on BOTH engines without
touching any nonzero value.

Every rounded projection whose operand can algebraically reach zero
from below — slopes, covariances, differences, z-scores — must go
through `stable_round` (Spark side) and the matching
`round(expr, d) + 0.0` spelling in the oracle SQL.
`tests/test_round7.py` greps the registry modules for bare
`F.round(F.regr_*` to keep new queries from reintroducing the bug.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, scale: int) -> Column:
    """`round(col, scale)` with canonical zero sign: `-0.0 → +0.0`.

    Use for any rounded aggregate that can land on zero from below
    (regr_slope/regr_r2 on degenerate inputs, covariances, deltas).
    The oracle SQL must spell the same idiom: `round(e, n) + 0.0`.
    """
    return F.round(col, scale) + F.lit(0.0)


def stable_round_sql(expr: str, scale: int) -> str:
    """The DuckDB spelling of `stable_round` for oracle strings."""
    return f"round({expr}, {scale}) + 0.0"
