"""Hexagonal cell index (H3-analog) in exact int64 arithmetic.

Complements the quadtree/Morton index in cellindex.py (the S2-analog):
SURVEY.md F24 calls for BOTH families — "S2-style face/Hilbert quadtree
int64 ids; hex k-ring on axial coords".  Hex cells have two properties
quads lack that matter for the kNN/skew machinery:

  * uniform adjacency — all 6 neighbours share an edge (quads mix 4
    edge + 4 corner neighbours), so a k-ring is an exact distance-k
    disk: |ring(k)| = 3k(k+1)+1 with no corner over-reach;
  * lower eccentricity — the worst-case center-to-boundary distance is
    ~15% smaller than a square of equal area, tightening kNN guard
    radii.

Exactness contract (the repo's oracle rule): the ONLY floating-point
step is one ``floor(coord * 1e6)`` per axis (a single IEEE multiply —
bit-identical in numpy, the JVM, and DuckDB); everything after is
int64, so the numpy kernel here, the Column expression in
cellexpr.hexcell_expr, and the SQL chain in contract._hex_sql agree
bit-for-bit on every input.

Grid model (pointy-top rows, "odd-r" offset → axial):

  X = floor(lon·1e6) + 540_000_000        (µdeg, strictly positive)
  Y = floor(lat·1e6) + 450_000_000
  at resolution r:  w = 7·2^(24-r)  (half cell width, µdeg)
                    u = 4·2^(24-r)  (quarter cell height; row pitch 3u)

Hex (q, r) has center  Xc = w·(2q + r),  Yc = 3u·r  and vertices
(±w, ±u), (0, ±2u) around it — w/u = 7/4 ≈ √3 makes cells near-regular
while keeping every constant an integer.  Point→cell:

  band  = (Y + u) div 3u ;  yrel = (Y + u) mod 3u
  yrel < 2u         → row = band               (non-ambiguous zone)
  else zigzag strip → row band iff the point lies inside the upward
    triangle:  u·t ≥ w·dy  AND  u·(2w − t) ≥ w·dy
    with t = (X − (band&1)·w + w) mod 2w  (frame centers the candidate
    hex at t = w), dy = yrel − 2u
  col = (X − (row&1)·w + w) div 2w ;  q = col − (row − (row&1))/2

(the X offset 540e6 > 2·(Y offset 450e6)·w/(6u) keeps q ≥ 0 at every
resolution since 2u ≥ w·¾ … concretely 8 ≥ 7).  Ids pack
``[res:5][q:26][r:26]`` into a positive int64; valid res 0..24
(res 9 ≈ 0.46° cells — the H3 res 7-9 ballpark the north star names).

Resolutions do not nest exactly (true of real H3 too — aperture-7
children overhang); ``hex_to_parent`` is defined, as in H3, as the
coarser cell containing this cell's center, computed in exact integer
space so it is replayable in SQL.
"""
from __future__ import annotations

import numpy as np

from .geometry import PackedPolygon

__all__ = [
    "hexcell_from_lonlat", "hex_res", "hex_qr", "hex_center",
    "hex_neighbors", "hex_k_ring", "hex_distance", "hex_to_parent",
    "hex_polygon_cover", "HEX_DEFAULT_RES", "hex_wu",
]

HEX_DEFAULT_RES = 9
_OFF_X = 540_000_000
_OFF_Y = 450_000_000
_Q_SHIFT = 26
_RES_SHIFT = 52
_QR_MASK = (1 << 26) - 1


def hex_wu(res: int) -> tuple[int, int]:
    """(w, u) integer geometry constants at ``res`` (µdeg)."""
    if not 0 <= res <= 24:
        raise ValueError(f"hex res must be 0..24, got {res}")
    return 7 << (24 - res), 4 << (24 - res)


def _quantize(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.floor(lon * 1e6).astype(np.int64) + _OFF_X
    y = np.floor(lat * 1e6).astype(np.int64) + _OFF_Y
    return x, y


def _assign_xy(x: np.ndarray, y: np.ndarray, res: int):
    """Integer hex assignment on offset-µdeg coords → (q, row)."""
    w, u = hex_wu(res)
    yp = y + u
    band = yp // (3 * u)
    yrel = yp - 3 * u * band
    # +w shifts the frame so the candidate row's hex center sits at
    # t = w (col owns x ∈ [Xc-w, Xc+w))
    t = (x - (band & 1) * w + w) % (2 * w)
    dy = yrel - 2 * u
    in_zig = yrel >= 2 * u
    below = (u * t >= w * dy) & (u * (2 * w - t) >= w * dy)
    row = band + (in_zig & ~below).astype(np.int64)
    col = (x - (row & 1) * w + w) // (2 * w)
    q = col - (row - (row & 1)) // 2
    return q, row


def _pack(q, r, res: int) -> np.ndarray:
    return ((np.int64(res) << np.int64(_RES_SHIFT))
            | (np.asarray(q, dtype=np.int64) << np.int64(_Q_SHIFT))
            | np.asarray(r, dtype=np.int64)).astype(np.int64)


def hexcell_from_lonlat(lon, lat, res: int = HEX_DEFAULT_RES) -> np.ndarray:
    """int64 hex cell id(s) for point(s) at the given resolution."""
    x, y = _quantize(lon, lat)
    q, r = _assign_xy(x, y, res)
    return _pack(q, r, res)


def hex_res(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> np.int64(_RES_SHIFT)) \
        .astype(np.int64)


def hex_qr(cell) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(cell, dtype=np.int64)
    return ((c >> np.int64(_Q_SHIFT)) & np.int64(_QR_MASK),
            c & np.int64(_QR_MASK))


def _center_xy(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact integer centers in offset-µdeg space."""
    q, r = hex_qr(cell)
    res = hex_res(cell)
    xc = np.empty(q.shape, dtype=np.int64)
    yc = np.empty(r.shape, dtype=np.int64)
    for rv in np.unique(res):
        w, u = hex_wu(int(rv))
        m = res == rv
        xc[m] = w * (2 * q[m] + r[m])
        yc[m] = 3 * u * r[m]
    return xc, yc, res


def hex_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) doubles of the exact integer cell centers."""
    xc, yc, _ = _center_xy(np.atleast_1d(np.asarray(cell, dtype=np.int64)))
    return (xc - _OFF_X) / 1e6, (yc - _OFF_Y) / 1e6


def hex_distance(a, b) -> np.ndarray:
    """Axial grid distance (edge hops) between same-res cells.
    Mixed-resolution pairs live on different lattices — the raw (q, r)
    comparison would return a small plausible-but-meaningless number,
    so they raise instead (mirror of hex_to_parent's res check)."""
    if np.any(hex_res(a) != hex_res(b)):
        raise ValueError("hex_distance requires same-resolution cells")
    qa, ra = hex_qr(a)
    qb, rb = hex_qr(b)
    dq = qa - qb
    dr = ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def hex_neighbors(cell) -> np.ndarray:
    """The 6 edge-adjacent cells of each input cell, shape (n, 6);
    off-planet slots (q or r would go negative, coarse-res edge only)
    are -1."""
    c = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    q, r = hex_qr(c)
    res = hex_res(c)
    out = []
    for dq, dr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
        nq, nr = q + dq, r + dr
        ids = _pack(nq, nr, 0) | (res << np.int64(_RES_SHIFT))
        out.append(np.where((nq >= 0) & (nr >= 0), ids, np.int64(-1)))
    return np.stack(out, axis=1).astype(np.int64)


def hex_k_ring(cell: int, k: int = 1) -> np.ndarray:
    """All cells within axial distance k of ``cell`` — exactly
    3k(k+1)+1 ids (edges clamp only below q/r = 0, off-planet)."""
    c = np.asarray([cell], dtype=np.int64)
    q0, r0 = hex_qr(c)
    q0, r0 = int(q0[0]), int(r0[0])
    res = int(hex_res(c)[0])
    qs, rs = [], []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            if q0 + dq >= 0 and r0 + dr >= 0:
                qs.append(q0 + dq)
                rs.append(r0 + dr)
    return np.sort(_pack(np.array(qs, dtype=np.int64),
                         np.array(rs, dtype=np.int64), res))


def hex_to_parent(cell, parent_res: int) -> np.ndarray:
    """Coarser cell containing each cell's center (H3-parent
    semantics; exact — integer centers feed the integer assigner)."""
    xc, yc, res = _center_xy(np.atleast_1d(np.asarray(cell, dtype=np.int64)))
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    q, r = _assign_xy(xc, yc, parent_res)
    return _pack(q, r, parent_res)


def hex_polygon_cover(poly: PackedPolygon, res: int = HEX_DEFAULT_RES):
    """Sound hex cover: (interior, boundary) like cellindex.polygon_cover.

    boundary = every cell whose bbox overlaps any edge's bbox (superset
    of edge-crossed cells → soundness: a point inside the polygon lies
    in a boundary cell or in a cell wholly inside, whose center is then
    inside); interior = center-inside cells minus boundary.
    """
    w, u = hex_wu(res)
    xmin, ymin, xmax, ymax = poly.bbox
    gx_lo = int(np.floor(xmin * 1e6)) + _OFF_X
    gx_hi = int(np.floor(xmax * 1e6)) + _OFF_X
    gy_lo = int(np.floor(ymin * 1e6)) + _OFF_Y
    gy_hi = int(np.floor(ymax * 1e6)) + _OFF_Y

    # candidate cells: every (q, r) whose hex bbox [Xc±w, Yc±2u]
    # intersects the polygon bbox
    r_lo = max((gy_lo - 2 * u) // (3 * u), 0)
    r_hi = (gy_hi + 2 * u) // (3 * u)
    cand_q, cand_r = [], []
    for r in range(r_lo, r_hi + 1):
        # Xc = w(2q + r) ∈ [gx_lo - w, gx_hi + w]
        q_lo = max(-((-(gx_lo - w)) // (2 * w)) - r // 2 - 1, 0)
        q_hi = (gx_hi + w) // (2 * w) - r // 2 + 1
        for q in range(q_lo, q_hi + 1):
            cand_q.append(q)
            cand_r.append(r)
    if not cand_q:
        z = np.empty(0, dtype=np.int64)
        return z, z
    cq = np.array(cand_q, dtype=np.int64)
    cr = np.array(cand_r, dtype=np.int64)
    xc = w * (2 * cq + cr)
    yc = 3 * u * cr
    ids = _pack(cq, cr, res)

    # boundary: cell bbox overlaps any edge bbox
    ex_lo = np.floor(np.minimum(poly.x1, poly.x2) * 1e6).astype(np.int64) + _OFF_X
    ex_hi = np.floor(np.maximum(poly.x1, poly.x2) * 1e6).astype(np.int64) + _OFF_X
    ey_lo = np.floor(np.minimum(poly.y1, poly.y2) * 1e6).astype(np.int64) + _OFF_Y
    ey_hi = np.floor(np.maximum(poly.y1, poly.y2) * 1e6).astype(np.int64) + _OFF_Y
    is_boundary = np.zeros(len(ids), dtype=bool)
    for xl, xh, yl, yh in zip(ex_lo, ex_hi, ey_lo, ey_hi):
        is_boundary |= ((xc + w >= xl) & (xc - w <= xh)
                        & (yc + 2 * u >= yl) & (yc - 2 * u <= yh))
    boundary = np.sort(ids[is_boundary])

    c_lon = (xc - _OFF_X) / 1e6
    c_lat = (yc - _OFF_Y) / 1e6
    inside = poly.contains(c_lon, c_lat)
    # ids[~is_boundary] is disjoint from boundary by construction
    # (same array, same mask) — no setdiff needed
    interior = np.sort(ids[inside & ~is_boundary])
    return interior, boundary
