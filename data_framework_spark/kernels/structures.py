"""Numpy kernels for magnetic-structure finding (single-timestep
tiles) — the executor-side halves of the reference's
`find_structures` pipeline (src/datasets/vpicdataset.py:295-533),
reimplemented from the documented semantics (SURVEY.md §2.10).

Geometry primitives use the standard public formulas:
- counter-clockwise orientation test / segment intersection
  (vpicdataset.py:25-46 uses the same classic ccw construction;
  colinear segments are not handled, same as the reference);
- line-line intersection via the determinant formula
  (vpicdataset.py:49-68 cites the same Wikipedia closed form).

All functions take/return plain ndarrays so they unit-test without
Spark; pipelines/structures.py runs them inside per-timestep
`applyInPandas` kernels.
"""

from __future__ import annotations

import numpy as np

from data_framework_spark.kernels.ndimage import (
    binary_dilation,
    extrema_filter,
    find_contours,
    flood,
    gap_fill,
    label,
)


def _ccw(a, b, c) -> np.ndarray:
    """(b-a) × (c-a) > 0, vectorized over leading dims."""
    return (c[..., 1] - a[..., 1]) * (b[..., 0] - a[..., 0]) > (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])


def segments_intersect(a, b, c, d) -> np.ndarray:
    """Proper intersection test of segments (a,b) × (c,d); colinear
    contacts are not detected (reference's documented limitation,
    vpicdataset.py:28)."""
    return (_ccw(a, c, d) != _ccw(b, c, d)) & (_ccw(a, b, c) != _ccw(a, b, d))


def line_intersection_point(a, b, c, d) -> np.ndarray:
    """Intersection of the supporting lines of (a,b) and (c,d)."""
    x1, y1 = a[..., 0], a[..., 1]
    x2, y2 = b[..., 0], b[..., 1]
    x3, y3 = c[..., 0], c[..., 1]
    x4, y4 = d[..., 0], d[..., 1]
    den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    px = ((x1 * y2 - y1 * x2) * (x3 - x4) - (x1 - x2) * (x3 * y4 - y3 * x4)) / den
    py = ((x1 * y2 - y1 * x2) * (y3 - y4) - (y1 - y2) * (x3 * y4 - y3 * x4)) / den
    return np.stack([px, py], axis=-1)


def _contour_segments(contours: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Flatten polylines to (start, end) segment arrays, index space."""
    starts, ends = [], []
    for c in contours:
        if len(c) >= 2:
            starts.append(c[:-1])
            ends.append(c[1:])
    if not starts:
        z = np.empty((0, 2))
        return z, z
    return np.concatenate(starts), np.concatenate(ends)


def find_nulls(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """Null points of the 2-D field (b1, b2): intersections of the
    b1=0 and b2=0 iso-contours (vpicdataset.py:383-426). All-pairs
    segment test — the reference's own O(S1·S2) hot spot; bounded
    here because inputs are single-timestep tiles. Returns (n, 2)
    fractional grid coordinates (row, col)."""
    c1 = find_contours(b1, 0.0)
    c2 = find_contours(b2, 0.0)
    s1a, s1b = _contour_segments(c1)
    s2a, s2b = _contour_segments(c2)
    if len(s1a) == 0 or len(s2a) == 0:
        return np.empty((0, 2))
    A = s1a[:, None, :]
    B = s1b[:, None, :]
    C = s2a[None, :, :]
    D = s2b[None, :, :]
    hits = segments_intersect(A, B, C, D)
    ii, jj = np.nonzero(hits)
    if len(ii) == 0:
        return np.empty((0, 2))
    pts = line_intersection_point(s1a[ii], s1b[ii], s2a[jj], s2b[jj])
    return pts


def bilinear_at(field: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Bilinear sample of `field` at fractional (row, col) points."""
    if len(pts) == 0:
        return np.empty(0)
    r = np.clip(pts[:, 0], 0, field.shape[0] - 1 - 1e-9)
    c = np.clip(pts[:, 1], 0, field.shape[1] - 1 - 1e-9)
    r0 = np.floor(r).astype(int)
    c0 = np.floor(c).astype(int)
    fr = r - r0
    fc = c - c0
    return (
        field[r0, c0] * (1 - fr) * (1 - fc)
        + field[r0 + 1, c0] * fr * (1 - fc)
        + field[r0, c0 + 1] * (1 - fr) * fc
        + field[r0 + 1, c0 + 1] * fr * fc
    )


def classify_nulls(hess_det: np.ndarray, nulls: np.ndarray):
    """X vs O by the sign of the interpolated Hessian determinant of ψ
    (vpicdataset.py:431-439): positive → O point, negative → X."""
    vals = bilinear_at(hess_det, nulls)
    signs = np.sign(vals)
    return nulls[signs < 0], nulls[signs > 0]  # (x_points, o_points)


def _rasterize(points: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    mask = np.zeros(shape, dtype=bool)
    if len(points):
        r = np.clip(np.rint(points[:, 0]).astype(int), 0, shape[0] - 1)
        c = np.clip(np.rint(points[:, 1]).astype(int), 0, shape[1] - 1)
        mask[r, c] = True
    return mask


def separatrices_and_o_structures(
    flux: np.ndarray,
    x_points: np.ndarray,
    d_per_de: int,
    de_tol: float,
):
    """Separatrix mask + O-structure decomposition
    (vpicdataset.py:444-479).

    For each X point: take the flux iso-contours at the X point's
    (interpolated) flux value, keep contours approaching within
    d_per_de·de_tol grid cells, rasterize; dilate each X point into
    the mask; gap-fill. Then flood-decompose the complement from
    deterministic seeds (min scan-order unfilled cell — the
    reference's seeded-RNG pick is order-independent, SURVEY §2.8)
    and keep interior regions (not touching the boundary) as
    O-structures. Returns (separatrix int mask, o_structure int mask).
    """
    shape = flux.shape
    sep = np.zeros(shape, dtype=bool)
    radius = max(d_per_de * de_tol, 1.0)
    x_flux = bilinear_at(flux, x_points)
    for k in range(len(x_points)):
        contours = find_contours(flux, float(x_flux[k]))
        for c in contours:
            dist = np.sqrt(((c - x_points[k][None, :]) ** 2).sum(axis=1)).min()
            if dist <= radius:
                sep |= _rasterize(c, shape)
        sep |= binary_dilation(_rasterize(x_points[k : k + 1], shape))
    sep_filled = gap_fill(sep).astype(bool)

    # flood-decompose the complement; keep regions not touching border
    o_mask = np.zeros(shape, dtype=bool)
    remaining = ~sep_filled
    while remaining.any():
        seed = np.argwhere(remaining)[0]
        region = flood(remaining, (int(seed[0]), int(seed[1])))
        touches_border = (
            region[0, :].any()
            or region[-1, :].any()
            or region[:, 0].any()
            or region[:, -1].any()
        )
        if not touches_border:
            o_mask |= region
        remaining &= ~region
    return sep_filled.astype(np.int64), o_mask.astype(np.int64)


def current_sheets(
    jy_smooth: np.ndarray, cs_limit: float = 0.5
) -> np.ndarray:
    """Signed current-sheet mask (vpicdataset.py:482-520).

    Local 10×10 extrema of the smoothed out-of-plane current; keep
    peaks beyond the 3σ (population) outlier thresholds; flood each
    surviving peak over the region above cs_limit·peak (positive
    side) / below 0.5·peak (negative side — the reference hardcodes
    0.5 there instead of cs_limit, vpicdataset.py:516; quirk kept).
    Returns int mask in {-1, 0, +1} (positive minus negative sheets,
    vpicdataset.py:530-533).
    """
    maxf = extrema_filter(jy_smooth, (10, 10), "max")
    minf = extrema_filter(jy_smooth, (10, 10), "min")
    max_mask = jy_smooth == maxf
    min_mask = jy_smooth == minf
    cs_maxes = jy_smooth[max_mask]
    cs_mins = jy_smooth[min_mask]
    hi = cs_maxes.mean() + cs_maxes.std() * 3  # np.std = population
    lo = cs_mins.mean() - cs_mins.std() * 3
    pos = np.zeros(jy_smooth.shape, dtype=bool)
    for r, c in np.argwhere(max_mask & (jy_smooth > hi)):
        peak = jy_smooth[r, c]
        above = jy_smooth >= cs_limit * peak
        pos |= flood(above, (int(r), int(c)))
    neg = np.zeros(jy_smooth.shape, dtype=bool)
    for r, c in np.argwhere(min_mask & (jy_smooth < lo)):
        peak = jy_smooth[r, c]
        below = jy_smooth <= 0.5 * peak  # reference's 0.5 literal
        neg |= flood(below, (int(r), int(c)))
    return pos.astype(np.int64) - neg.astype(np.int64)
