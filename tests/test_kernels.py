"""Unit tests for the pure-NumPy raster kernels (no Spark needed) —
differential against naive/analytic oracles, pinning the boundary
modes and quirks documented in kernels/ndimage.py."""

from __future__ import annotations

import numpy as np
import pytest

from data_framework_spark.kernels.ndimage import (
    binary_dilation,
    extrema_filter,
    find_contours,
    flood,
    gap_fill,
    gaussian_filter,
    label,
)
from data_framework_spark.kernels.structures import (
    bilinear_at,
    find_nulls,
    line_intersection_point,
    segments_intersect,
)


def test_gaussian_preserves_mean_and_smooths():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(40, 40))
    out = gaussian_filter(a, 2.0)
    # reflect mode preserves the mean of a constant field exactly
    np.testing.assert_allclose(gaussian_filter(np.ones((20, 20)), 3.0), 1.0)
    assert out.var() < a.var() * 0.2
    # separable kernel: smoothing axis-by-axis equals joint call
    step = gaussian_filter(gaussian_filter(a, (2.0, 0)), (0, 2.0))
    np.testing.assert_allclose(out, step, atol=1e-12)


def test_gaussian_matches_direct_convolution_1d():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(1, 30))
    sigma = 1.5
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    padded = np.pad(a[0], radius, mode="symmetric")  # 'reflect' in scipy terms
    ref = np.convolve(padded, k[::-1], mode="valid")
    np.testing.assert_allclose(gaussian_filter(a, (0, sigma))[0], ref, atol=1e-12)


def test_extrema_filter_matches_bruteforce():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(12, 15))
    out = extrema_filter(a, (4, 3), "max")
    n0, n1 = a.shape
    for i in range(n0):
        for j in range(n1):
            vals = []
            for d0 in range(-2, 2):  # size 4 → offsets -2..1
                for d1 in range(-1, 2):  # size 3 → offsets -1..1
                    y, x = i + d0, j + d1
                    y = -y - 1 if y < 0 else (2 * n0 - y - 1 if y >= n0 else y)
                    x = -x - 1 if x < 0 else (2 * n1 - x - 1 if x >= n1 else x)
                    vals.append(a[y, x])
            assert out[i, j] == max(vals)


def test_label_and_flood():
    mask = np.array(
        [
            [1, 1, 0, 0, 1],
            [0, 1, 0, 1, 1],
            [0, 0, 0, 0, 0],
            [1, 0, 1, 1, 0],
        ],
        dtype=bool,
    )
    lbl, n = label(mask)
    assert n == 4  # diagonal does NOT connect (cross connectivity)
    assert lbl[0, 0] == lbl[1, 1] == lbl[0, 1]
    assert lbl[0, 4] == lbl[1, 3] == lbl[1, 4]
    assert lbl[3, 0] not in (lbl[3, 2], 0)
    region = flood(mask, (0, 0))
    assert region.sum() == 3
    # flood over False region stays in the False component
    holes = flood(mask, (2, 0))
    assert holes[2, :].all() and not holes[0, 0]


def _label_bfs(mask):
    """Naive scan-order BFS labeling — the semantic oracle for the
    vectorized run-based label()."""
    from collections import deque

    lbl = np.zeros(mask.shape, dtype=np.int64)
    current = 0
    for i in range(mask.shape[0]):
        for j in range(mask.shape[1]):
            if mask[i, j] and lbl[i, j] == 0:
                current += 1
                dq = deque([(i, j)])
                lbl[i, j] = current
                while dq:
                    y, x = dq.popleft()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = y + dy, x + dx
                        if (
                            0 <= ny < mask.shape[0]
                            and 0 <= nx < mask.shape[1]
                            and mask[ny, nx]
                            and lbl[ny, nx] == 0
                        ):
                            lbl[ny, nx] = current
                            dq.append((ny, nx))
    return lbl, current


def test_label_matches_bfs_on_random_masks():
    rng = np.random.default_rng(11)
    for _ in range(60):
        shape = (rng.integers(1, 24), rng.integers(1, 24))
        mask = rng.random(shape) < rng.uniform(0.2, 0.8)
        lo, no = _label_bfs(mask)
        ln, nn = label(mask)
        assert no == nn
        np.testing.assert_array_equal(lo, ln)


def test_label_edge_cases():
    empty = np.zeros((4, 5), dtype=bool)
    lbl, n = label(empty)
    assert n == 0 and not lbl.any()
    full = np.ones((3, 3), dtype=bool)
    lbl, n = label(full)
    assert n == 1 and (lbl == 1).all()
    one_row = np.array([[1, 0, 1, 1, 0, 1]], dtype=bool)
    lbl, n = label(one_row)
    assert n == 3 and lbl.tolist() == [[1, 0, 2, 2, 0, 3]]


def test_binary_dilation_cross():
    m = np.zeros((5, 5), dtype=bool)
    m[2, 2] = True
    d = binary_dilation(m)
    assert d.sum() == 5
    assert d[2, 2] and d[1, 2] and d[3, 2] and d[2, 1] and d[2, 3]
    assert not d[1, 1]  # cross, not square


def test_gap_fill_closes_one_pixel_gaps_and_wraps():
    a = np.zeros((5, 7), dtype=np.int64)
    a[2, 1] = a[2, 3] = 1  # horizontal gap at (2,2)
    out = gap_fill(a)
    assert out[2, 2] == 1
    assert out.dtype == np.int64
    # np.roll wraparound: pixels at opposite edges of a row "surround"
    # the edge pixel (the reference's quirk, vpicdataset.py:78-108)
    b = np.zeros((3, 4), dtype=np.int64)
    b[1, 1] = b[1, 3] = 1
    out_b = gap_fill(b)
    assert out_b[1, 2] == 1  # normal interior fill
    assert out_b[1, 0] == 1  # wrapped fill: left neighbor is column 3


def test_find_contours_straight_line():
    # linear field: contour of f = x - 2.5 is the vertical line x=2.5
    f = np.tile(np.arange(6.0), (4, 1))
    cs = find_contours(f, 2.5)
    assert len(cs) == 1
    np.testing.assert_allclose(cs[0][:, 1], 2.5, atol=1e-12)
    assert len(cs[0]) == 4  # one point per row


def test_find_contours_circle_radius():
    n = 41
    y, x = np.mgrid[0:n, 0:n] - n // 2
    f = np.sqrt(x**2 + y**2)
    cs = find_contours(f, 10.0)
    assert len(cs) == 1
    c = cs[0] - n // 2
    radii = np.sqrt((c**2).sum(axis=1))
    assert abs(radii.mean() - 10.0) < 0.1
    # closed contour: endpoints meet
    np.testing.assert_allclose(cs[0][0], cs[0][-1], atol=1e-9)


def test_segment_intersection_and_point():
    a = np.array([0.0, 0.0])
    b = np.array([2.0, 2.0])
    c = np.array([0.0, 2.0])
    d = np.array([2.0, 0.0])
    assert segments_intersect(a, b, c, d)
    assert not segments_intersect(a, b, c, c + 0.1)
    p = line_intersection_point(a, b, c, d)
    np.testing.assert_allclose(p, [1.0, 1.0])


def test_find_nulls_analytic():
    # b1 = y - 10, b2 = x - 14 → single null at (10, 14)
    n = 25
    yy, xx = np.mgrid[0:n, 0:n].astype(float)
    nulls = find_nulls(yy - 10.0, xx - 14.0)
    assert len(nulls) == 1
    np.testing.assert_allclose(nulls[0], [10.0, 14.0], atol=1e-9)


def test_bilinear_at():
    f = np.arange(12.0).reshape(3, 4)
    np.testing.assert_allclose(bilinear_at(f, np.array([[1.0, 2.0]])), [6.0])
    np.testing.assert_allclose(
        bilinear_at(f, np.array([[0.5, 0.5]])), [(0 + 1 + 4 + 5) / 4]
    )


def test_halo_tiled_equals_whole_grid(spark):
    """tile_apply_halo must be bit-identical to tile_apply for a
    bounded-radius stencil, across tile sizes that do and don't divide
    the grid, including tile > grid (single patch)."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_framework_spark.kernels import ndimage
    from data_framework_spark.plans.tile_kernel import tile_apply, tile_apply_halo

    rng = np.random.default_rng(3)
    n0, n1 = 20, 17
    rows = [
        (0.0, i, j, float(i), float(j), float(v))
        for (i, j), v in np.ndenumerate(rng.integers(0, 50, (n0, n1)))
    ]
    df = spark.createDataFrame(
        rows, "t double, i0 long, i1 long, c0 double, c1 double, value double"
    )
    kern = lambda a: ndimage.gaussian_filter(a, 1.0)
    want = {
        (r["i0"], r["i1"]): round(r["value"], 6)
        for r in tile_apply(df, kern).collect()
    }
    for tile in (7, 8, 64):
        got = {
            (r["i0"], r["i1"]): round(r["value"], 6)
            for r in tile_apply_halo(df, kern, radius=4, tile=tile).collect()
        }
        assert got == want, f"tile={tile}"
