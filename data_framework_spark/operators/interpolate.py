"""Interpolating 1-D line slice through an n-D field — the
reference's signature capability (src/variables/statmeshvar.py:111-200),
re-expressed as a weighted join.

Reference semantics reproduced exactly:
- only 1-D slices (2 set points); more raise (statmeshvar.py:144-150);
- methods 'linear' | 'nearest', anything else raises (:141-143);
- degenerate (single-line) meshes raise (:133-140);
- line parametrized p = p0 + s·û (:157-158); the sample step is the
  grid spacing of the axis MOST ALIGNED with the line, chosen by
  np.argmax(û) — the reference's raw argmax, not abs (:159-162);
- s-range clipped to the mesh box by per-dim ray entry/exit
  (:166-183), then both ends shrunk by dx/3 (:184-185, the
  reference's NaN-avoidance quirk) — we keep it for parity;
- samples s ∈ arange(min_s, max_s, dx) (:187); result mesh is the
  s-array, data shape (time, n_s) (:189-190, :199-200).

Execution shape: the per-sample cell indices and corner weights are
computed DRIVER-side from the cached mesh arrays (tiny: the same
arithmetic the reference does on its mesh attributes) and broadcast
as a small sample table — 2^d rows per sample for linear, 1 for
nearest. The interpolation itself is then one equi-join on the index
columns plus a groupBy(sample, t) weighted sum: fully distributed,
no Python in the data path, linear in |samples|·2^d regardless of
field size. This is exact multilinear interpolation on a rectilinear
grid (the weighted-corner formulation RegularGridInterpolator uses).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from data_framework_spark.variable import SparkVariable


def _line_samples(mesh: list[np.ndarray], set_pts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sample positions along the clipped line: returns (s_values,
    points[ns, d], unit_vec). Pure driver-side math mirroring
    statmeshvar.py:151-187."""
    pts = np.asarray(set_pts, dtype=float)
    if pts.shape[0] != 2:
        raise ValueError(
            "only 1-D line slices (exactly 2 set points) are supported"
        )
    ndim = len(mesh)
    if pts.shape[1] != ndim:
        raise ValueError(f"set points must have {ndim} components")
    for d, m in enumerate(mesh):
        if len(m) < 2:
            raise ValueError(
                f"cannot interpolate along degenerate dimension {d}"
            )
    p0, p1 = pts[0], pts[1]
    diff = p1 - p0
    unit = diff / np.linalg.norm(diff)
    step_dim = int(np.argmax(unit))  # reference's raw argmax quirk (:159)
    dx = float(mesh[step_dim][1] - mesh[step_dim][0])

    # clip to the mesh box via per-dim ray entry/exit (:166-183)
    min_s, max_s = -np.inf, np.inf
    for d in range(ndim):
        lo, hi = float(mesh[d][0]), float(mesh[d][-1])
        u = unit[d]
        if u == 0.0:
            if not (lo <= p0[d] <= hi):
                return np.empty(0), np.empty((0, ndim)), unit
            continue
        s_a = (lo - p0[d]) / u
        s_b = (hi - p0[d]) / u
        enter, exit_ = (s_a, s_b) if s_a <= s_b else (s_b, s_a)
        min_s = max(min_s, enter)
        max_s = min(max_s, exit_)
    # dx/3 shrink, "try to avoid nans maybe" (:184-185)
    min_s += dx / 3.0
    max_s -= dx / 3.0
    s_vals = np.arange(min_s, max_s, dx)
    points = p0[None, :] + s_vals[:, None] * unit[None, :]
    return s_vals, points, unit


def _corner_rows(mesh: list[np.ndarray], s_vals, points, method: str):
    """(sample_idx, s, corner indices..., weight) rows, driver-side."""
    ndim = len(mesh)
    rows = []
    for k in range(len(s_vals)):
        p = points[k]
        per_dim: list[list[tuple[int, float]]] = []
        ok = True
        for d in range(ndim):
            m = mesh[d]
            j = int(np.searchsorted(m, p[d])) - 1
            j = max(0, min(j, len(m) - 2))
            denom = m[j + 1] - m[j]
            w = (p[d] - m[j]) / denom
            if w < -1e-12 or w > 1 + 1e-12:
                ok = False  # outside the grid (possible pre-shrink edge)
                break
            w = min(max(w, 0.0), 1.0)
            if method == "nearest":
                # scipy tie rule: normalized distance ≤ 0.5 → lower
                per_dim.append([(j + 1, 1.0) if w > 0.5 else (j, 1.0)])
            else:
                per_dim.append([(j, 1.0 - w), (j + 1, w)])
        if not ok:
            continue
        # cartesian product of per-dim corner choices
        combos = [((), 1.0)]
        for choices in per_dim:
            combos = [
                (idx + (j,), wt * w) for idx, wt in combos for j, w in choices
            ]
        for idx, wt in combos:
            rows.append((k, float(s_vals[k]), *idx, float(wt)))
    return rows


def line_slice(var: "SparkVariable", set_pts, interp: str = "linear") -> "SparkVariable":
    """The `_spaceslice` operator: 1-D interpolated slice as a join."""
    from data_framework_spark.variable import SparkVariable

    if interp not in ("linear", "nearest"):
        raise ValueError(
            f"interpolation method {interp!r} not supported (linear|nearest)"
        )
    mesh = var.mesh
    s_vals, points, _unit = _line_samples(mesh, set_pts)
    rows = _corner_rows(mesh, s_vals, points, interp)
    ndim = var.ndim
    idx_cols = [f"i{d}" for d in range(ndim)]
    schema = (
        "s_idx long, s double, "
        + ", ".join(f"{c} long" for c in idx_cols)
        + ", weight double"
    )
    spark = var.df.sparkSession
    samples = spark.createDataFrame(rows, schema)

    joined = var.df.join(F.broadcast(samples), on=idx_cols, how="inner")
    out = (
        joined.groupBy("t", "s_idx", "s")
        .agg(F.sum(F.col("weight") * F.col("value")).alias("value"))
        .select(
            "t",
            F.col("s_idx").alias("i0"),
            F.col("s").alias("c0"),
            "value",
        )
    )
    return SparkVariable(
        var.label, out, 1, var._timeseries, [s_vals.astype(float)]
    )
