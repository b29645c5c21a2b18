"""Measure the per-X-point separatrix/O-structure kernel at scale
(r16): the verbatim reference semantics run gap_fill + a full flood
decomposition of the complement PER X POINT, so the kernel is
O(n_x · cells) with a flood-decomposition constant. This script
measures that constant on synthetic island-chain fields at growing
grid sizes and X-point counts — numbers for SURVEY §8's scale-posture
paragraph (the kernel runs inside per-timestep applyInPandas tasks,
so at 100 TB the relevant question is per-TILE cost, not total).

Run: python scripts/measure_masks_kernel_scale.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from data_framework_spark.kernels.structures import (  # noqa: E402
    current_sheets,
    separatrices_and_o_structures,
)


def island_field(n0: int, n1: int, n_islands: int):
    """ψ = ln cosh z + ε Σ cos(k x) island chain with n_islands X
    points inside the box; returns (flux, x_points)."""
    z = np.linspace(-8.0, 8.0, n0)
    x = np.linspace(0.0, 2 * np.pi * n_islands, n1)
    zz, xx = np.meshgrid(z, x, indexing="ij")
    flux = np.log(np.cosh(zz)) + 0.3 * np.cos(xx)
    # X points at cos(x)=+1... for this ψ the X rows are z=0; place
    # one X per island period at x = π + 2πk (fractional col indices)
    row = (0.0 - z[0]) / (z[1] - z[0])
    xs = []
    for k in range(n_islands):
        xc = (np.pi + 2 * np.pi * k - x[0]) / (x[1] - x[0])
        if 1 <= xc < n1 - 1:
            xs.append((row, xc))
    return flux, np.array(xs)


def main() -> None:
    print(f"{'grid':>12} {'n_x':>4} {'sep/o (s)':>10} {'sheets (s)':>11} "
          f"{'us/cell/x':>10}")
    for n0, n1, n_isl in [
        (120, 64, 1),
        (240, 256, 4),
        (480, 512, 8),
        (1056, 1000, 10),
    ]:
        flux, xpts = island_field(n0, n1, n_isl)
        jy = 8.0 / np.cosh(np.linspace(-8, 8, n0))[:, None] ** 2 * np.ones(
            (1, n1)
        ) + 20.0 * np.exp(
            -((np.arange(n0)[:, None] - n0 * 0.7) ** 2
              + (np.arange(n1)[None, :] - n1 * 0.6) ** 2) / 30.0
        )
        t0 = time.perf_counter()
        sep, o = separatrices_and_o_structures(flux, xpts, 7, 5.0)
        t_sep = time.perf_counter() - t0
        t0 = time.perf_counter()
        current_sheets(jy, 0.5)
        t_cs = time.perf_counter() - t0
        cells = n0 * n1
        per = t_sep / max(len(xpts), 1) / cells * 1e6
        print(f"{n0}x{n1:>5} {len(xpts):>4} {t_sep:>10.3f} {t_cs:>11.3f} "
              f"{per:>10.3f}")
        assert sep.sum() > 0  # the measurement exercised real contours


if __name__ == "__main__":
    main()
