"""Oracle-checked instantiations of the interpolating line slice —
the reference's signature capability (src/variables/statmeshvar.py:
111-200), run over a deterministic 16×16 grid derived from lineitem
(the same derivation as windows.q_fluxfn_grid, so DuckDB rebuilds the
identical field).

The slice geometry (clipping, dx/3 shrink, argmax step axis,
corner-weight computation) is pure driver-side arithmetic in
operators/interpolate.py; both the Spark query and the oracle SQL use
the SAME precomputed corner table — Spark joins it as a broadcast
DataFrame, DuckDB as an inlined VALUES list. What the hash check then
pins is the distributed part: the weighted-join + groupBy(sample)
aggregation that performs the actual interpolation over the field.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.operators.interpolate import (
    _corner_rows,
    _line_samples,
    line_slice,
)
from data_framework_spark.operators.raster_queries import (
    grid_cells_sql,
    lineitem_cells,
)
from data_framework_spark.variable import SparkVariable

# the shared lineitem cell derivation, value = summed quantity
_GRID_CELLS = grid_cells_sql("sum(l_quantity)           AS value")

D0, D1 = 0.5, 0.25
MESH = [np.arange(16) * D0, np.arange(16) * D1]
SET_PTS = [(0.2, 0.3), (7.3, 3.5)]

_S_VALS, _POINTS, _UNIT = _line_samples(MESH, SET_PTS)


def _grid_variable(spark: SparkSession, sf_dir: str) -> SparkVariable:
    """16×16 single-timestep field from lineitem (b = Σ quantity);
    cell derivation shared with raster_queries.lineitem_cells."""
    grid = lineitem_cells(
        spark, sf_dir, F.sum("l_quantity").alias("value")
    ).select(
        F.lit(0.0).alias("t"),
        "i0",
        "i1",
        (F.col("i0") * D0).alias("c0"),
        (F.col("i1") * D1).alias("c1"),
        "value",
    )
    return SparkVariable("b", grid, 2, np.array([0.0]), MESH)


def _q_line_slice(spark: SparkSession, sf_dir: str, method: str) -> DataFrame:
    var = _grid_variable(spark, sf_dir)
    out = line_slice(var, SET_PTS, interp=method)
    return out.df.select(
        F.col("i0").alias("s_idx"),
        F.round("c0", 6).alias("s"),
        F.round("value", 4).alias("value"),
    )


def q_line_slice_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear interpolating line slice (statmeshvar.py 'linear')."""
    return _q_line_slice(spark, sf_dir, "linear")


def q_line_slice_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor line slice (statmeshvar.py 'nearest')."""
    return _q_line_slice(spark, sf_dir, "nearest")


def _corner_values_sql(method: str) -> str:
    rows = _corner_rows(MESH, _S_VALS, _POINTS, method)
    vals = ", ".join(
        f"({k}, {s!r}, {i0}, {i1}, {w!r})" for k, s, i0, i1, w in rows
    )
    return f"""
WITH grid AS ({_GRID_CELLS}
),
corners(s_idx, s, i0, i1, weight) AS (VALUES {vals})
SELECT
  c.s_idx::BIGINT AS s_idx,
  round(c.s, 6)   AS s,
  round(sum(c.weight * g.value), 4) AS value
FROM corners c JOIN grid g ON c.i0 = g.i0 AND c.i1 = g.i1
GROUP BY c.s_idx, c.s
"""


Q_LINE_SLICE_LINEAR_SQL = _corner_values_sql("linear")
Q_LINE_SLICE_NEAREST_SQL = _corner_values_sql("nearest")
