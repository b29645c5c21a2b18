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
        shape, r0, r1 = tile_ranks(
            pdf["i0"].to_numpy(), pdf["i1"].to_numpy()
        )
        tile = scatter_tile(shape, r0, r1, pdf[value_col].to_numpy())
        out = kernel(tile)
        res = pdf.copy()
        res[out_col] = np.asarray(out, dtype=float)[r0, r1]
        return res

    return df.groupBy("t").applyInPandas(run, schema=df.schema)


def tile_ranks(
    i0: np.ndarray, i1: np.ndarray
) -> tuple[tuple[int, int], np.ndarray, np.ndarray]:
    """Rank-compaction of (i0, i1) index columns into dense tile
    coordinates — the ONE long-frame → ndarray bridge shared by
    tile_apply and the structures kernels (round-9 review: previously
    re-implemented there and recomputed per value column). Returns
    (tile shape, row ranks, col ranks)."""
    u0 = np.unique(i0)
    u1 = np.unique(i1)
    return (
        (len(u0), len(u1)),
        np.searchsorted(u0, i0),
        np.searchsorted(u1, i1),
    )


def scatter_tile(
    shape: tuple[int, int],
    r0: np.ndarray,
    r1: np.ndarray,
    vals: np.ndarray,
) -> np.ndarray:
    """Scatter a long-frame value column into a NaN-initialized dense
    tile at the tile_ranks coordinates."""
    tile = np.full(shape, np.nan)
    tile[r0, r1] = vals
    return tile


def tile_apply_halo(
    df: DataFrame,
    kernel: Callable[[np.ndarray], np.ndarray],
    radius: int,
    tile: int = 256,
    value_col: str = "value",
    out_col: str = "value",
) -> DataFrame:
    """Halo-exchange variant of `tile_apply` for BOUNDED-radius
    stencils: the grid splits into `tile`×`tile` patches, each row
    replicates into every patch whose radius-`radius` halo contains it
    (≤ (2r/T+1)² copies, ~1+4r/T for r ≪ T), the kernel runs per
    patch, and only each patch's proper (non-halo) cells are emitted.

    Correctness: a cell's stencil output depends only on cells within
    `radius`; every proper cell of a patch has its full neighborhood
    present (halo data at interior patch edges, true grid edge — where
    the kernel's own reflect handling is correct — at boundary
    patches). So the tiled result is bit-identical to the whole-grid
    kernel, which the differential test pins.

    This is the scale path `tile_apply`'s docstring promises for a
    single timestep too large for one task: parallelism = number of
    patches, peak memory = (T+2r)² per task, shuffle = one repartition
    of the (slightly replicated) grid by patch id. NOT applicable to
    unbounded-propagation kernels (flood, label, wraparound gap_fill)
    — those stay whole-tile or move to their join/window forms.
    """
    t_, r_ = float(tile), float(radius)
    import pyspark.sql.functions as F

    with_patch = (
        df.withColumn(
            "__ta",
            F.explode(
                F.sequence(
                    F.floor((F.col("i0") - r_) / t_).cast("long"),
                    F.floor((F.col("i0") + r_) / t_).cast("long"),
                )
            ),
        )
        .withColumn(
            "__tb",
            F.explode(
                F.sequence(
                    F.floor((F.col("i1") - r_) / t_).cast("long"),
                    F.floor((F.col("i1") + r_) / t_).cast("long"),
                )
            ),
        )
        # patches fully outside the grid hold only halo rows and emit
        # nothing; drop the obviously-invalid negatives early
        .filter((F.col("__ta") >= 0) & (F.col("__tb") >= 0))
    )

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        _, ta, tb = key
        i0 = pdf["i0"].to_numpy()
        i1 = pdf["i1"].to_numpy()
        u0 = np.unique(i0)
        u1 = np.unique(i1)
        r0 = np.searchsorted(u0, i0)
        r1 = np.searchsorted(u1, i1)
        patch = np.full((len(u0), len(u1)), np.nan)
        patch[r0, r1] = pdf[value_col].to_numpy()
        out = kernel(patch)
        proper = (i0 // tile == ta) & (i1 // tile == tb)
        res = pdf[proper].copy()
        res[out_col] = np.asarray(out, dtype=float)[r0[proper], r1[proper]]
        return res.drop(columns=["__ta", "__tb"])

    return with_patch.groupBy("t", "__ta", "__tb").applyInPandas(
        run, schema=df.schema
    )
