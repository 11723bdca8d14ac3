"""Cover-accelerated country lookup — the executor-side "prepared
geometry" (scale path for the point-in-polygon join).

Precomputes, per boundary polygon, an interior/boundary cell cover at a
chosen resolution.  Lookup then is:

    cell = cell_from_lonlat(lon, lat)        # bit math
    interior hit  → cc directly (no geometry)   — the common case
    boundary hit  → ray-cast refine against that polygon only
    neither       → ''

On a cluster this is what turns the theta-join into an equi-join: the
interior map is broadcast state, and only boundary-cell rows pay for
geometry.  The structure pickles compactly for sc.broadcast().
"""
from __future__ import annotations

import numpy as np

from .boundaries import BoundaryIndex
from .cellindex import DEFAULT_RES, cell_from_lonlat, polygon_cover

__all__ = ["PreparedLookup"]


class PreparedLookup:
    def __init__(self, index: BoundaryIndex, res: int = DEFAULT_RES):
        self.index = index
        self.res = res
        interior: dict[int, str] = {}
        boundary: dict[int, list[int]] = {}     # cell -> polygon ordinals
        for ordinal, poly in enumerate(index.polys):
            icells, bcells = polygon_cover(poly, res)
            for c in icells.tolist():
                # first-match-wins in deterministic sorted-cc order:
                # keep the first polygon that claims an interior cell
                interior.setdefault(c, poly.cc)
            for c in bcells.tolist():
                boundary.setdefault(c, []).append(ordinal)
        self.interior = interior
        self.boundary = boundary

    def lookup(self, lon, lat) -> np.ndarray:
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        cells = cell_from_lonlat(lon, lat, self.res)
        out = np.full(len(lon), "", dtype=object)
        refine_idx: list[int] = []
        for i, c in enumerate(cells.tolist()):
            cc = self.interior.get(c)
            if cc is not None:
                out[i] = cc
            elif c in self.boundary:
                refine_idx.append(i)
        if refine_idx:
            ridx = np.asarray(refine_idx, dtype=np.int64)
            # group refinement rows by their candidate polygon list
            cand_map: dict[tuple[int, ...], list[int]] = {}
            for i in refine_idx:
                key = tuple(self.boundary[int(cells[i])])
                cand_map.setdefault(key, []).append(i)
            for ordinals, rows in cand_map.items():
                rows_a = np.asarray(rows, dtype=np.int64)
                unresolved = np.ones(len(rows_a), dtype=bool)
                for o in ordinals:           # ordinals are sorted-cc order
                    if not unresolved.any():
                        break
                    poly = self.index.polys[o]
                    sub = rows_a[unresolved]
                    hit = poly.contains(lon[sub], lat[sub])
                    out[sub[hit]] = poly.cc
                    unresolved[np.nonzero(unresolved)[0][hit]] = False
        return out
