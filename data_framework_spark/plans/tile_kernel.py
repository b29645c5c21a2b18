"""Raster↔long tile runner — the one genuinely novel executor-side
component (SURVEY.md §4 point 2).

Stencil operators (smoothing, extrema filters, flood fill, contours)
need a dense 2-D neighborhood; the engine's storage is long-format
rows. `tile_apply` re-partitions a 2-D variable by timestep, and for
each per-t group: densifies to a NumPy tile, runs the kernel, and
re-explodes the result to long rows — one `applyInPandas` pass, Arrow
both ways, no driver involvement.

Scale posture: a tile is ONE timestep of ONE variable — the
reference's own working-set unit (its whole pipeline is per-timestep,
vpicdataset.py:334-336). Parallelism across timesteps/variables is
what Spark gives for free; a single tile exceeding executor memory is
the signal to switch that operator to a windowed/pure-join variant —
the prefix-sum and gradient forms live in operators/windows.py, and
operators/raster_queries.py shows each stencil (smoothing, extrema,
gap fill, dilation, labeling, contours) re-expressed as joins/window
SQL against the same kernels in kernels/ndimage.py.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def tile_apply(
    df: DataFrame,
    kernel: Callable[[np.ndarray], np.ndarray],
    value_col: str = "value",
    out_col: str = "value",
) -> DataFrame:
    """Apply `kernel` (2-D ndarray → same-shape ndarray) per timestep.

    Input schema: t, i0, i1, c0, c1, <value_col>. Output: identical
    minus replaced values. Index gaps (from zoom slices) are handled
    by rank-compacting within the tile and scattering back.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        i0 = pdf["i0"].to_numpy()
        i1 = pdf["i1"].to_numpy()
        u0 = np.unique(i0)
        u1 = np.unique(i1)
        r0 = np.searchsorted(u0, i0)
        r1 = np.searchsorted(u1, i1)
        tile = np.full((len(u0), len(u1)), np.nan)
        tile[r0, r1] = pdf[value_col].to_numpy()
        out = kernel(tile)
        res = pdf.copy()
        res[out_col] = np.asarray(out, dtype=float)[r0, r1]
        return res

    return df.groupBy("t").applyInPandas(run, schema=df.schema)
