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


import numpy as np


def _gauss_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _reflect_index(idx: np.ndarray, n: int) -> np.ndarray:
    """Map arbitrary integer indices into [0, n) under scipy's
    'reflect' boundary (edge duplicated: c b a | a b c | c b a),
    with REPEATED reflection — the extension is periodic with period
    2n, so fold by mod first. The previous single-bounce form
    silently wrapped (numpy negative indexing) for n <= |offset| < 2n
    and raised IndexError beyond, i.e. whenever the kernel radius
    reached the axis length (e.g. sigma=3 -> radius 12 on a <=6-cell
    zoom slice; round-9 review)."""
    if n == 1:
        return np.zeros_like(idx)
    m = np.mod(idx, 2 * n)
    return np.where(m >= n, 2 * n - 1 - m, m)


def _correlate1d_reflect(a: np.ndarray, k: np.ndarray, axis: int) -> np.ndarray:
    """1-D correlation along `axis` with scipy's 'reflect' boundary
    (edge value duplicated: c b a | a b c)."""
    r = (len(k) - 1) // 2
    a = np.moveaxis(a, axis, -1)
    n = a.shape[-1]
    idx = _reflect_index(np.arange(-r, n + r), n)
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

    reflect = _reflect_index  # repeated reflection: any window size

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
    """Connected-component labels, cross connectivity, scan order.

    Run-based two-pass CCL, vectorized: (1) row runs are detected and
    numbered in scan order with array ops; (2) vertically adjacent runs
    are unioned (union-by-min-root over the run graph — Python work is
    O(#runs), never O(#pixels)); (3) components are numbered by their
    minimal run id, which is exactly the scan-order first-encounter
    numbering a pixel-BFS produces (the first pixel of a component in
    a row-major scan starts its minimal run).
    """
    assert mask.ndim == 2
    m = mask.astype(bool)
    lbl = np.zeros(m.shape, dtype=np.int64)
    if not m.any():
        return lbl, 0
    # (1) runs: a run starts at a set pixel whose left neighbor is unset
    left = np.zeros_like(m)
    left[:, 1:] = m[:, :-1]
    starts = m & ~left
    run_id = np.cumsum(starts.ravel()).reshape(m.shape) - 1  # valid where m
    n_runs = int(starts.sum())
    # (2) vertical adjacencies between runs → fully vectorized
    # min-label propagation over the run graph (edge relaxation +
    # pointer jumping converges in O(log diameter) rounds, each O(E))
    adj = m[1:, :] & m[:-1, :]
    ra = run_id[:-1, :][adj]
    rb = run_id[1:, :][adj]
    roots = np.arange(n_runs)
    if ra.size:
        ea = np.concatenate([ra, rb])
        eb = np.concatenate([rb, ra])
        while True:
            upd = roots.copy()
            np.minimum.at(upd, ea, roots[eb])
            upd = np.minimum(upd, upd[upd])
            if np.array_equal(upd, roots):
                break
            roots = upd
    # (3) dense-rank roots (a component's root IS its min run id)
    uniq, comp_of_run = np.unique(roots, return_inverse=True)
    lbl[m] = comp_of_run[run_id[m]] + 1
    return lbl, len(uniq)


def flood(mask: np.ndarray, seed: tuple[int, int]) -> np.ndarray:
    """Boolean region connected to `seed` over equal values
    (connectivity=1), as skimage.segmentation.flood.

    Run-based scanline fill: row runs of the equal-value mask are
    extracted vectorized (one pass over the frame), then the BFS walks
    RUNS, not pixels — each step finds the overlapping runs in the
    rows above/below with two searchsorted calls (runs within a row
    are disjoint and sorted, so overlaps form a contiguous slice).
    Python-loop work is O(#runs in the region), independent of region
    area; the old per-pixel deque BFS was O(#pixels) Python steps."""
    assert mask.ndim == 2
    eq = mask == mask[seed]
    h, w = eq.shape
    # run starts: set pixel with unset left neighbor; ends symmetric
    left = np.zeros_like(eq)
    left[:, 1:] = eq[:, :-1]
    right = np.zeros_like(eq)
    right[:, :-1] = eq[:, 1:]
    srow, x0 = np.nonzero(eq & ~left)   # per-run row, first col
    _, x1 = np.nonzero(eq & ~right)     # same order: last col
    n_runs = srow.size
    # first run index of each row (runs are emitted in row-major order)
    row_lo = np.searchsorted(srow, np.arange(h))
    row_hi = np.searchsorted(srow, np.arange(h), side="right")
    # run containing the seed
    sy, sx = seed
    r0 = row_lo[sy] + int(np.searchsorted(x0[row_lo[sy] : row_hi[sy]], sx, "right")) - 1
    visited = np.zeros(n_runs, dtype=bool)
    visited[r0] = True
    stack = [r0]
    while stack:
        r = stack.pop()
        for ny in (srow[r] - 1, srow[r] + 1):
            if ny < 0 or ny >= h:
                continue
            lo, hi = row_lo[ny], row_hi[ny]
            if lo == hi:
                continue
            # overlapping runs: x0' <= x1[r] and x1' >= x0[r]; both
            # bounds are contiguous because runs are sorted + disjoint
            a = lo + np.searchsorted(x1[lo:hi], x0[r])
            b = lo + np.searchsorted(x0[lo:hi], x1[r], side="right")
            for nr in range(a, b):
                if not visited[nr]:
                    visited[nr] = True
                    stack.append(nr)
    out = np.zeros(eq.shape, dtype=bool)
    for r in np.nonzero(visited)[0]:
        out[srow[r], x0[r] : x1[r] + 1] = True
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
    """The reference's 1-px gap closer (vpicdataset.py:71-113): a
    pixel fills when a DIRECT neighbor on one side is set AND ANY of
    the THREE cells on the opposite side (opposite direct neighbor or
    either opposite diagonal) is set — one term per direction
    (opp_left/right/up/down) — plus the two both-diagonals pairs
    (ul&dr, ur&dl). Built from np.roll, so edges WRAP AROUND (the
    reference's quirk, kept deliberately). Returns int64 0/1.

    Round-16 correction: the previous version required strict opposing
    PAIRS only (left&right, up&down, diagonals), a strict subset of
    the reference's rule — under-filled 19/256 cells on the driver's
    own sf0.01 mask (r15 verdict). The any-of-three disjunction below
    is transcribed term-by-term from the reference's np.roll formula
    and differentially tested against a verbatim copy of that formula
    in tests/test_reference_formulas.py.
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
            left & (ur | dr | right),   # opp_left  (vpicdataset.py:78-81)
            right & (dl | ul | left),   # opp_right (vpicdataset.py:84-87)
            up & (dl | dr | down),      # opp_up    (vpicdataset.py:90-93)
            down & (ul | ur | up),      # opp_down  (vpicdataset.py:96-99)
            ul & dr,                    # opp_diag  (vpicdataset.py:101-108)
            ur & dl,
        ]
    )
    return filled.astype(np.int64)


def find_contours(field: np.ndarray, level: float) -> list[np.ndarray]:
    """Marching-squares iso-contours of a 2-D field at `level`, with
    linear interpolation on cell edges — the algorithm behind
    skimage.measure.find_contours (vpicdataset.py:383-384). Returns a
    list of (n, 2) float arrays of (row, col) points in traversal
    order; closed contours repeat their first point last.

    Implementation (vectorized): classify every cell at once with
    array ops; each physical grid edge gets ONE canonical interpolated
    crossing point shared by both adjacent cells, so stitching keys
    match bit-exactly. Saddle cells are disambiguated with the
    cell-mean rule (same default as the public algorithm). Segments
    are ordered by (cell scan order, intra-cell order) to keep output
    deterministic. The per-segment stitching loop that remains is
    O(#contour segments), not O(#pixels).
    """
    f = np.asarray(field, dtype=float)
    n0, n1 = f.shape
    b = f > level
    # canonical edge crossings: H[i,j] on edge (i,j)-(i,j+1),
    # V[i,j] on edge (i,j)-(i+1,j)
    with np.errstate(divide="ignore", invalid="ignore"):
        th = (level - f[:, :-1]) / (f[:, 1:] - f[:, :-1])
        tv = (level - f[:-1, :]) / (f[1:, :] - f[:-1, :])
    # cell case from the four corners ul, ur, lr, ll — the only other
    # full-array pass; everything below gathers active cells only
    case = (
        b[:-1, :-1] * 1 + b[:-1, 1:] * 2 + b[1:, 1:] * 4 + b[1:, :-1] * 8
    ).ravel()
    act = np.flatnonzero((case != 0) & (case != 15))
    ca = case[act]
    ai = act // (n1 - 1)
    aj = act % (n1 - 1)
    # per-active-cell edge points; edges: 0 top, 1 right, 2 bottom, 3 left
    t_top = th[ai, aj]
    t_bot = th[ai + 1, aj]
    t_left = tv[ai, aj]
    t_right = tv[ai, aj + 1]
    aif = ai.astype(float)
    ajf = aj.astype(float)
    er = [aif, aif + t_right, aif + 1.0, aif + t_left]
    ec = [ajf + t_top, ajf + 1.0, ajf + t_bot, ajf]
    # saddle disambiguation needs the cell mean (same association
    # order as the naive sum over corners)
    mean = (
        (f[ai, aj] + f[ai, aj + 1]) + f[ai + 1, aj + 1]
    ) + f[ai + 1, aj]
    mean = mean / 4.0
    edge_pairs = {
        1: [(3, 0)], 2: [(0, 1)], 3: [(3, 1)], 4: [(1, 2)],
        6: [(0, 2)], 7: [(3, 2)], 8: [(2, 3)], 9: [(2, 0)],
        11: [(2, 1)], 12: [(1, 3)], 13: [(1, 0)], 14: [(0, 3)],
    }
    seg_a0, seg_a1, seg_b0, seg_b1, seg_order = [], [], [], [], []

    def emit(sel: np.ndarray, ea: int, eb: int, sub: int) -> None:
        if not sel.any():
            return
        seg_a0.append(er[ea][sel])
        seg_a1.append(ec[ea][sel])
        seg_b0.append(er[eb][sel])
        seg_b1.append(ec[eb][sel])
        # scan-order key: cell linear index * 2 + intra-cell position
        seg_order.append(act[sel] * 2 + sub)

    for cs, pairs in edge_pairs.items():
        sel = ca == cs
        for sub, (ea, eb) in enumerate(pairs):
            emit(sel, ea, eb, sub)
    # saddles: two segments each, resolved by the cell mean
    for cs, lo_pairs, hi_pairs in (
        (5, [(3, 0), (1, 2)], [(3, 2), (1, 0)]),
        (10, [(0, 1), (2, 3)], [(0, 3), (2, 1)]),
    ):
        sel = ca == cs
        for sub, (ea, eb) in enumerate(lo_pairs):
            emit(sel & (mean <= level), ea, eb, sub)
        for sub, (ea, eb) in enumerate(hi_pairs):
            emit(sel & (mean > level), ea, eb, sub)

    contours: list[np.ndarray] = []
    if not seg_a0:
        return contours
    a0 = np.concatenate(seg_a0)
    a1 = np.concatenate(seg_a1)
    b0 = np.concatenate(seg_b0)
    b1 = np.concatenate(seg_b1)
    order = np.argsort(np.concatenate(seg_order), kind="stable")
    a0, a1, b0, b1 = a0[order], a1[order], b0[order], b1[order]
    # endpoint keys, quantized vectorized (the round(p, 9) of the
    # naive version) — merges coincident points from level==vertex ties
    ka = list(zip(np.round(a0, 9).tolist(), np.round(a1, 9).tolist()))
    kb = list(zip(np.round(b0, 9).tolist(), np.round(b1, 9).tolist()))
    pa = list(zip(a0.tolist(), a1.tolist()))
    pb = list(zip(b0.tolist(), b1.tolist()))

    # stitch segments into polylines (undirected): trace from
    # degree-1 endpoints first (open contours), then remaining cycles.
    # First drop degenerate output: zero-length segments and
    # duplicates emitted by both adjacent cells.
    seen_segs = set()
    segs: list[tuple] = []  # (pt_a, key_a, pt_b, key_b)
    for i in range(len(ka)):
        k1, k2 = ka[i], kb[i]
        if k1 == k2:
            continue
        sk = (k1, k2) if k1 <= k2 else (k2, k1)
        if sk in seen_segs:
            continue
        seen_segs.add(sk)
        segs.append((pa[i], k1, pb[i], k2))

    adj: dict = {}
    # exact endpoint per stitch key: the quantized key merges
    # coincident points, but a traced path must START from the exact
    # interpolated endpoint, not the 9dp-rounded key (round-9 review:
    # previously the first vertex of every open contour was the key
    # tuple, off by up to 5e-10 while all other vertices were exact)
    exact_pt: dict = {}
    for sid, (a, k1, b, k2) in enumerate(segs):
        adj.setdefault(k1, []).append((sid, b, k2))
        adj.setdefault(k2, []).append((sid, a, k1))
        exact_pt.setdefault(k1, a)
        exact_pt.setdefault(k2, b)

    used = [False] * len(segs)

    def trace(start_key, start_pt):
        path = [start_pt]
        k = start_key
        while True:
            cands = [e for e in adj.get(k, []) if not used[e[0]]]
            if not cands:
                return path
            sid, other, k = cands[0]
            used[sid] = True
            path.append(other)

    open_starts = [k for k, lst in adj.items() if len(lst) == 1]
    for start_key in open_starts:
        if all(used[sid] for sid, _, _ in adj[start_key]):
            continue
        contours.append(np.array(trace(start_key, exact_pt[start_key])))
    for sid, (a, _k1, b, k2) in enumerate(segs):
        if not used[sid]:
            used[sid] = True
            path = trace(k2, b)
            contours.append(np.array([a] + path))
    return contours
