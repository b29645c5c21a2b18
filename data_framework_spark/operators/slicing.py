"""Slicing / filtering operators — the reference's core query surface.

Reference semantics reproduced (citations → /root/reference):
- `_timeslice(timelims)`: inclusive both ends
  (src/variables/statmeshvar.py:95-100) → `col.between(lo, hi)`.
- `_zoom(zooms)`: per-dimension inclusive range with bounds sorted
  first so order doesn't matter, ±inf = unbounded
  (src/variables/statmeshvar.py:102-109) → conjunction of `between`
  with driver-side `sorted()` of each pair.
- variable selection by case-sensitive substring, `get_vars`
  (src/datasets/vpicdataset.py:206-213) → `col.contains(s)`.

All three are single predicates on a scan: Catalyst pushes them into
the parquet reader (verify `PushedFilters` in explain), so they cost a
partial file read, not a full-table pass — the property that matters
at 100 TB where the time/space predicate typically selects <1% of
row groups (min/max page statistics prune the rest).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def timeslice(df: DataFrame, time_col: str, timelims: Sequence) -> DataFrame:
    """Inclusive [lo, hi] time filter (statmeshvar.py:95-100 semantics)."""
    lo, hi = timelims
    return df.filter(F.col(time_col).between(F.lit(lo), F.lit(hi)))


def zoom(df: DataFrame, dim_cols: Sequence[str], zooms: Sequence[Sequence[float]]) -> DataFrame:
    """Per-dimension inclusive box filter with auto-sorted bounds.

    Mirrors `_zoom` (statmeshvar.py:102-109): each bounds pair is
    sorted so (hi, lo) behaves like (lo, hi); ±inf disables that side.
    """
    if len(dim_cols) != len(zooms):
        raise ValueError(
            f"need one bounds pair per dimension: {len(dim_cols)} dims, {len(zooms)} pairs"
        )
    pred: Column | None = None
    for col_name, pair in zip(dim_cols, zooms):
        lo, hi = sorted(pair)
        clauses = []
        if not math.isinf(lo):
            clauses.append(F.col(col_name) >= F.lit(lo))
        if not math.isinf(hi):
            clauses.append(F.col(col_name) <= F.lit(hi))
        for c in clauses:
            pred = c if pred is None else (pred & c)
    return df if pred is None else df.filter(pred)


def select_vars_substring(df: DataFrame, var_col: str, patterns: Sequence[str]) -> DataFrame:
    """Keep rows whose `var_col` contains ANY of the given substrings.

    Case-sensitive substring semantics of `get_vars`
    (vpicdataset.py:206-213). Disjunction of `contains` — still a
    scan-level predicate (pushed as string-contains filters).
    """
    pred: Column | None = None
    for p in patterns:
        c = F.col(var_col).contains(p)
        pred = c if pred is None else (pred | c)
    return df if pred is None else df.filter(pred)


# --- driver-checkable query instantiations over the test tables ------------


def q_timeslice_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ndslice(timelims=...)` analog on `events`: inclusive ts range.

    The bounds go to `load_table(ts_between=...)` as well, which
    installs the coarse raw-column twin of the predicate so row-group
    pruning happens at the scan; the exact inclusive filter on the
    converted ts stays here (see sources/tables.py)."""
    lims = ("2024-01-02 00:00:00", "2024-01-04 00:00:00")
    ev = load_table(spark, sf_dir, "events", ts_between=lims)
    return timeslice(ev, "ts", lims).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


Q_TIMESLICE_EVENTS_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00' AND TIMESTAMP '2024-01-04 00:00:00'
"""


def q_zoom_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D `_zoom` analog: inclusive box over (l_quantity, l_extendedprice).

    Bounds intentionally given reversed to exercise the sort-first
    semantics (statmeshvar.py:104).
    """
    li = load_table(spark, sf_dir, "lineitem")
    boxed = zoom(
        li,
        ["l_quantity", "l_extendedprice"],
        [(30.0, 10.0), (float("-inf"), 20000.0)],  # first pair reversed on purpose
    )
    return boxed.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


Q_ZOOM_LINEITEM_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity BETWEEN 10.0 AND 30.0
  AND l_extendedprice <= 20000.0
"""


def q_select_vars_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`get_vars` substring selection over the events 'variable' column."""
    ev = load_table(spark, sf_dir, "events")
    return select_vars_substring(ev, "event_type", ["sign", "err"]).select(
        "event_id", "event_type", "value"
    )


Q_SELECT_VARS_SUBSTRING_SQL = """
SELECT event_id, event_type, value
FROM events
WHERE contains(event_type, 'sign') OR contains(event_type, 'err')
"""
