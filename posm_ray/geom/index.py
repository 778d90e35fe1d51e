"""Grid spatial index: the Ray-side analogue of posm's per-level
``rtree.index.Index`` + prepared-geometry dict (extract.py:75-77,152-158;
exposm/utils.py:38-48).

Built ONCE per map_batches actor (in ``__init__``) from a broadcast boundary
table; probed per batch with vectorized candidate lookup. Registration uses
the hierarchical cell covering of each polygon's bbox (cells.covering), probe
resolves a point's cell to candidate polygon ids, then runs exact
ray-crossing PIP.

Tie-breaking: the reference returns the FIRST rtree candidate containing the
point — an index-internal order (utils.py:38-48). We define **min-osm_id
wins** (deterministic, documented deviation per SURVEY.md §7.5.2); fixtures
use non-overlapping polygons per level so goldens are unaffected.
"""

from __future__ import annotations

import numpy as np

from .. import cells
from . import kernels


class GridIndex:
    """Spatial index over a set of (id, rings) polygons at one admin level."""

    def __init__(self, ids: list[str], ring_lists: list[list[np.ndarray]],
                 res: int | None = None):
        if len(ids) != len(ring_lists):
            raise ValueError("ids and ring_lists length mismatch")
        # sort by id so candidate lists are in min-id order (deterministic win)
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        self.ids = [ids[i] for i in order]
        self.rings = [ring_lists[i] for i in order]
        self.bboxes = np.array(
            [kernels.rings_bbox(r) for r in self.rings], dtype=np.float64
        ).reshape(len(self.rings), 4)
        if res is None:
            res = self._pick_res()
        self.res = res
        self.cell_to_cands: dict[int, list[int]] = {}
        for i in range(len(self.rings)):
            minx, miny, maxx, maxy = self.bboxes[i]
            for c in cells.covering(minx, miny, maxx, maxy, res):
                self.cell_to_cands.setdefault(int(c), []).append(i)

    def _pick_res(self) -> int:
        """Choose the coarsest res where the average polygon bbox covers
        <= ~64 cells, bounding both index size and probe fan-out."""
        if len(self.rings) == 0:
            return 0
        w = float(np.mean(self.bboxes[:, 2] - self.bboxes[:, 0]))
        h = float(np.mean(self.bboxes[:, 3] - self.bboxes[:, 1]))
        span = max(w, h, 1e-9)
        for res in range(cells.MAX_RES + 1):
            if cells.cell_width_deg(res) < span / 8.0:
                return max(res - 1, 0)
        return cells.MAX_RES

    def query_points(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """For each point: the min osm_id whose polygon contains it, or ''."""
        idx = self.query_points_idx(lat, lon)
        vals = np.array(self.ids + [""], dtype=object)
        return vals[np.where(idx >= 0, idx, len(self.ids))]

    def query_points_idx(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """For each point: the INDEX into ``self.ids`` (min-id order, so the
        min-osm_id winner) of the containing polygon, or -1. Integer output
        so consumers (PIPJoin's hierarchy check) stay fully vectorized —
        the per-row string-dict comparison this replaces was the only
        row-at-a-time loop on the flagship path (VERDICT r4 #5).

        Vectorized grouping: points are bucketed by (cell -> candidate list),
        then each candidate polygon is tested against all its bucket's points
        at once with the vectorized PIP kernel (intersect_geom analogue,
        exposm/utils.py:38-48, deterministic tie-break).
        """
        n = len(lat)
        out = np.full(n, -1, dtype=np.int64)
        if n == 0 or not self.cell_to_cands:
            return out
        pcell = cells.cell_id(lat, lon, self.res)
        order = np.argsort(pcell, kind="stable")
        sorted_cells = pcell[order]
        bounds = np.flatnonzero(np.diff(sorted_cells)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sorted_cells)]))
        for s, e in zip(starts, ends):
            cands = self.cell_to_cands.get(int(sorted_cells[s]))
            if not cands:
                continue
            idx = order[s:e]
            plat, plon = lat[idx], lon[idx]
            unassigned = np.ones(len(idx), dtype=bool)
            for ci in cands:  # min-id order
                if not unassigned.any():
                    break
                minx, miny, maxx, maxy = self.bboxes[ci]
                m = unassigned & (plon >= minx) & (plon <= maxx) & \
                    (plat >= miny) & (plat <= maxy)
                if not m.any():
                    continue
                inside = kernels.points_in_rings(plon[m], plat[m], self.rings[ci])
                hit = np.flatnonzero(m)[inside]
                if len(hit):
                    out[idx[hit]] = ci
                    unassigned[hit] = False
        return out
