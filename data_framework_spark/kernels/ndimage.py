"""Pure-NumPy raster kernels (no scipy/skimage in this environment).

Each function reimplements, from the public algorithm definitions,
exactly the behavior the reference gets from its libraries — same
boundary modes and structuring elements — so differential tests can
pin semantics:

- `gaussian_filter`: scipy.ndimage.gaussian_filter semantics
  (separable, mode='reflect', truncate=4.0, radius=int(truncate·σ+0.5))
  — used by the reference at vpicdataset.py:364-365, :482-483.
- `extrema_filter`: scipy.ndimage.maximum/minimum_filter with
  size=(s0,s1), mode='reflect', window offsets -(s//2)..s-1-(s//2)
  (vpicdataset.py:484-485 uses size=(10,10)).
- `label`: scipy.ndimage.label with the default cross structuring
  element (1-connectivity), sequential label numbering in scan order
  (vpicdataset.py:490-491).
- `flood`: skimage.segmentation.flood, connectivity=1 BFS
  (vpicdataset.py:470-471, :510, :518).
- `binary_dilation`: skimage.morphology.binary_dilation with the
  default cross footprint (vpicdataset.py:449-451).
- `gap_fill`: the reference's own np.roll stencil — wraparound edges
  included (vpicdataset.py:71-113).

These run inside executor-side Pandas kernels (see
plans/tile_kernel.py); they are deliberately simple loops/vector ops
over single-timestep tiles, which the reference's workloads bound to
a few k × few k cells.
"""

from __future__ import annotations

from collections import deque

import numpy as np


def _gauss_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _correlate1d_reflect(a: np.ndarray, k: np.ndarray, axis: int) -> np.ndarray:
    """1-D correlation along `axis` with scipy's 'reflect' boundary
    (edge value duplicated: c b a | a b c)."""
    r = (len(k) - 1) // 2
    a = np.moveaxis(a, axis, -1)
    n = a.shape[-1]
    idx = np.arange(-r, n + r)
    # reflect about -0.5 and n-0.5
    idx = np.where(idx < 0, -idx - 1, idx)
    idx = np.where(idx >= n, 2 * n - idx - 1, idx)
    padded = a[..., idx]
    out = np.zeros_like(a, dtype=float)
    for i, kv in enumerate(k):
        out += kv * padded[..., i : i + n]
    return np.moveaxis(out, -1, axis)


def gaussian_filter(a: np.ndarray, sigma) -> np.ndarray:
    """Separable Gaussian, per-axis sigma (0 = skip that axis)."""
    sigmas = np.broadcast_to(np.asarray(sigma, dtype=float), (a.ndim,))
    out = a.astype(float)
    for ax, s in enumerate(sigmas):
        if s > 0:
            out = _correlate1d_reflect(out, _gauss_kernel1d(s), ax)
    return out


def extrema_filter(a: np.ndarray, size: tuple[int, int], op: str) -> np.ndarray:
    """Sliding-window max/min, mode='reflect', scipy offset convention
    (window spans -(s//2) .. s-1-(s//2) around each cell)."""
    assert a.ndim == 2
    fn = np.maximum if op == "max" else np.minimum
    out = None
    n0, n1 = a.shape
    off0 = [o - (size[0] // 2) for o in range(size[0])]
    off1 = [o - (size[1] // 2) for o in range(size[1])]

    def reflect(idx, n):
        idx = np.where(idx < 0, -idx - 1, idx)
        return np.where(idx >= n, 2 * n - idx - 1, idx)

    i0 = np.arange(n0)[:, None]
    i1 = np.arange(n1)[None, :]
    for d0 in off0:
        r0 = reflect(i0 + d0, n0)
        for d1 in off1:
            r1 = reflect(i1 + d1, n1)
            sl = a[r0, r1]
            out = sl if out is None else fn(out, sl)
    return out


_CROSS = ((1, 0), (-1, 0), (0, 1), (0, -1))


def label(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Connected-component labels, cross connectivity, scan order."""
    assert mask.ndim == 2
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
                    for dy, dx in _CROSS:
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


def flood(mask: np.ndarray, seed: tuple[int, int]) -> np.ndarray:
    """Boolean region connected to `seed` over equal values
    (connectivity=1), as skimage.segmentation.flood."""
    assert mask.ndim == 2
    target = mask[seed]
    out = np.zeros(mask.shape, dtype=bool)
    dq = deque([seed])
    out[seed] = True
    while dq:
        y, x = dq.popleft()
        for dy, dx in _CROSS:
            ny, nx = y + dy, x + dx
            if (
                0 <= ny < mask.shape[0]
                and 0 <= nx < mask.shape[1]
                and not out[ny, nx]
                and mask[ny, nx] == target
            ):
                out[ny, nx] = True
                dq.append((ny, nx))
    return out


def binary_dilation(mask: np.ndarray) -> np.ndarray:
    """One-step dilation with the cross footprint."""
    out = mask.copy()
    out[1:, :] |= mask[:-1, :]
    out[:-1, :] |= mask[1:, :]
    out[:, 1:] |= mask[:, :-1]
    out[:, :-1] |= mask[:, 1:]
    return out


def gap_fill(array: np.ndarray) -> np.ndarray:
    """The reference's 1-px gap closer (vpicdataset.py:71-113):
    a pixel fills if opposing neighbors are set — left&right, up&down,
    or both diagonal pairs — built from np.roll, so edges WRAP AROUND
    (the reference's quirk, kept deliberately). Returns int64 0/1.
    """
    a = array.astype(bool)
    left = np.roll(a, 1, axis=1)
    right = np.roll(a, -1, axis=1)
    up = np.roll(a, 1, axis=0)
    down = np.roll(a, -1, axis=0)
    ul = np.roll(np.roll(a, 1, axis=0), 1, axis=1)
    dr = np.roll(np.roll(a, -1, axis=0), -1, axis=1)
    ur = np.roll(np.roll(a, 1, axis=0), -1, axis=1)
    dl = np.roll(np.roll(a, -1, axis=0), 1, axis=1)
    filled = np.logical_or.reduce(
        [
            a,
            np.logical_and(left, right),
            np.logical_and(up, down),
            np.logical_and(ul, dr),
            np.logical_and(ur, dl),
        ]
    )
    return filled.astype(np.int64)


def find_contours(field: np.ndarray, level: float) -> list[np.ndarray]:
    """Marching-squares iso-contours of a 2-D field at `level`, with
    linear interpolation on cell edges — the algorithm behind
    skimage.measure.find_contours (vpicdataset.py:383-384). Returns a
    list of (n, 2) float arrays of (row, col) points in traversal
    order; closed contours repeat their first point last.

    Implementation: classify each cell edge crossing, link crossings
    cell-to-cell. Saddle cells are disambiguated with the cell-mean
    rule (same default as the public algorithm).
    """
    n0, n1 = field.shape
    segs: dict[tuple[float, float], list[tuple[float, float]]] = {}

    def interp(p0, p1, v0, v1):
        t = (level - v0) / (v1 - v0)
        return (p0[0] + t * (p1[0] - p0[0]), p0[1] + t * (p1[1] - p0[1]))

    seg_list: list[tuple[tuple[float, float], tuple[float, float]]] = []
    for i in range(n0 - 1):
        for j in range(n1 - 1):
            # corners: ul, ur, lr, ll (row, col)
            c = [
                ((i, j), field[i, j]),
                ((i, j + 1), field[i, j + 1]),
                ((i + 1, j + 1), field[i + 1, j + 1]),
                ((i + 1, j), field[i + 1, j]),
            ]
            case = sum(1 << k for k, (_, v) in enumerate(c) if v > level)
            if case in (0, 15):
                continue
            # edge crossing points; edges: top(0-1) right(1-2)
            # bottom(2-3) left(3-0)
            pts = {}
            for e, (a, b) in enumerate(((0, 1), (1, 2), (2, 3), (3, 0))):
                (pa, va), (pb, vb) = c[a], c[b]
                if (va > level) != (vb > level):
                    pts[e] = interp(pa, pb, va, vb)
            edge_pairs = {
                1: [(3, 0)], 2: [(0, 1)], 3: [(3, 1)], 4: [(1, 2)],
                6: [(0, 2)], 7: [(3, 2)], 8: [(2, 3)], 9: [(2, 0)],
                11: [(2, 1)], 12: [(1, 3)], 13: [(1, 0)], 14: [(0, 3)],
            }
            if case in (5, 10):
                mean = sum(v for _, v in c) / 4.0
                if case == 5:
                    pairs = [(3, 0), (1, 2)] if mean <= level else [(3, 2), (1, 0)]
                else:
                    pairs = [(0, 1), (2, 3)] if mean <= level else [(0, 3), (2, 1)]
            else:
                pairs = edge_pairs[case]
            for ea, eb in pairs:
                seg_list.append((pts[ea], pts[eb]))

    # stitch segments into polylines (undirected): trace from
    # degree-1 endpoints first (open contours), then remaining cycles
    def key(p):
        return (round(p[0], 9), round(p[1], 9))

    # drop degenerate output from level==vertex ties: zero-length
    # segments and duplicates emitted by both adjacent cells
    seen_segs = set()
    clean = []
    for a, b in seg_list:
        ka, kb = key(a), key(b)
        if ka == kb:
            continue
        sk = (ka, kb) if ka <= kb else (kb, ka)
        if sk in seen_segs:
            continue
        seen_segs.add(sk)
        clean.append((a, b))
    seg_list = clean

    adj: dict = {}
    for sid, (a, b) in enumerate(seg_list):
        adj.setdefault(key(a), []).append((sid, b))
        adj.setdefault(key(b), []).append((sid, a))

    used = [False] * len(seg_list)
    contours = []

    def trace(start_pt):
        path = [start_pt]
        while True:
            cands = [
                (sid, other)
                for sid, other in adj.get(key(path[-1]), [])
                if not used[sid]
            ]
            if not cands:
                return path
            sid, other = cands[0]
            used[sid] = True
            path.append(other)

    open_starts = [p for p, lst in adj.items() if len(lst) == 1]
    for start_key in open_starts:
        lst = [(sid, o) for sid, o in adj[start_key] if not used[sid]]
        if not lst:
            continue
        contours.append(np.array(trace(start_key)))
    for sid, (a, b) in enumerate(seg_list):
        if not used[sid]:
            used[sid] = True
            path = trace(b)
            contours.append(np.array([a] + path))
    return contours
