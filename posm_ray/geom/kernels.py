"""Pure-numpy geometry kernels (no shapely/GEOS in this environment).

Polygons are represented as *ring lists*: ``list[np.ndarray (n,2) float64]``
where ring 0.. are closed (first point == last point) rings; for a
multipolygon each part carries (shell, holes...) flattened with a parallel
``ring_role`` array, or more simply: a polygon = list of rings where winding
is ignored and point-in-polygon uses the even-odd (ray crossing) rule, which
makes holes work without role bookkeeping.

Reference semantics rebuilt here:
- point-in-polygon probe          -> exposm/utils.py:38-48 (intersect_geom)
- validity gate + reason strings  -> exposm/utils.py:51-70 (check_bad_geom),
                                     reason grammar parsed at utils.py:105-115
- representative point            -> extract.py:211-213 (representative_point)
- Douglas-Peucker simplify        -> proc_functions.sql:203-333 (ST_Simplify,
                                     default tolerance 0.001, manage.py:116-121)
- buffer+simplify containment loop-> extract_poly.py:51-69 (checkGeom)
- snap-to-grid                    -> POSMmanagement/process.py:85-102 (in cells.py)
"""

from __future__ import annotations

import numpy as np

Ring = np.ndarray  # (n, 2) float64, closed (ring[0] == ring[-1])
RingList = list  # list[Ring]

BONKERS = "BONKERS!"  # sentinel for unparseable geometry, exposm/utils.py:67-69


# ---------------------------------------------------------------------------
# point in polygon (even-odd ray crossing)
# ---------------------------------------------------------------------------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: Ring) -> np.ndarray:
    """Even-odd ray-crossing test of many points against one closed ring.

    Vectorized over points AND edges: O(P*E) numpy ops. Points exactly on an
    edge are implementation-defined (fixtures avoid on-edge points; the
    reference probes representative points that are strictly interior,
    extract.py:211-213, so this matches its observable behavior).
    """
    x0 = ring[:-1, 0][None, :]
    y0 = ring[:-1, 1][None, :]
    x1 = ring[1:, 0][None, :]
    y1 = ring[1:, 1][None, :]
    px = px[:, None]
    py = py[:, None]
    # edge straddles the horizontal line through py
    cond = (y0 <= py) != (y1 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    crossings = cond & (px < xint)
    return (crossings.sum(axis=1) % 2).astype(bool)


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: RingList) -> np.ndarray:
    """Even-odd over all rings of a (multi)polygon: inside an odd number of
    rings == inside the polygon (holes subtract, islands add)."""
    inside = np.zeros(len(px), dtype=np.int64)
    for ring in rings:
        inside += points_in_ring(px, py, ring)
    return (inside % 2).astype(bool)


def point_in_rings(x: float, y: float, rings: RingList) -> bool:
    return bool(points_in_rings(np.array([x]), np.array([y]), rings)[0])


# ---------------------------------------------------------------------------
# bbox / area / centroid / representative point
# ---------------------------------------------------------------------------

def rings_bbox(rings: RingList) -> tuple[float, float, float, float]:
    minx = min(float(r[:, 0].min()) for r in rings)
    miny = min(float(r[:, 1].min()) for r in rings)
    maxx = max(float(r[:, 0].max()) for r in rings)
    maxy = max(float(r[:, 1].max()) for r in rings)
    return minx, miny, maxx, maxy


def ring_area(ring: Ring) -> float:
    """Signed shoelace area (CCW positive)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def rings_centroid(rings: RingList) -> tuple[float, float]:
    """Area-weighted centroid via the shoelace formula over all rings
    (holes carry opposite winding -> subtract naturally if wound opposite;
    we use |area| weighting of even-odd parts which is adequate for the
    representative-point fallback chain)."""
    A = 0.0
    cx = 0.0
    cy = 0.0
    for ring in rings:
        x, y = ring[:, 0], ring[:, 1]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        a = 0.5 * float(np.sum(cross))
        if a == 0.0:
            continue
        cx += float(np.sum((x[:-1] + x[1:]) * cross)) / 6.0
        cy += float(np.sum((y[:-1] + y[1:]) * cross)) / 6.0
        A += a
    if A == 0.0:
        # degenerate: average of vertices
        pts = np.vstack(rings)
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    return cx / A, cy / A


def representative_point(rings: RingList) -> tuple[float, float]:
    """A point guaranteed inside the polygon (reference extract.py:211-213
    uses shapely's representative_point; same contract, different —
    deterministic — construction):

    1. centroid if inside;
    2. else midpoint of the widest interior interval on the horizontal
       scanline through the bbox-middle y (nudged if it hits no interior).
    """
    cx, cy = rings_centroid(rings)
    if point_in_rings(cx, cy, rings):
        return cx, cy
    minx, miny, maxx, maxy = rings_bbox(rings)
    for frac in (0.5, 0.37, 0.61, 0.23, 0.77, 0.5 + 1e-7):
        y = miny + (maxy - miny) * frac
        xs = _scanline_crossings(y, rings)
        if len(xs) >= 2:
            # widest interior interval under even-odd rule
            widths = xs[1::2] - xs[0::2] if len(xs) % 2 == 0 else None
            if widths is None or len(widths) == 0:
                continue
            k = int(np.argmax(widths))
            x = (xs[2 * k] + xs[2 * k + 1]) / 2.0
            if point_in_rings(x, y, rings):
                return float(x), float(y)
    # last resort: first vertex nudged inward toward the centroid — a bare
    # vertex lies ON the ring boundary and would break the inside contract;
    # try successively larger nudges and keep the first that verifies.
    p = rings[0][0]
    for eps in (1e-9, 1e-7, 1e-5, 1e-3, 0.5):
        x = float(p[0] + eps * (cx - p[0]))
        y = float(p[1] + eps * (cy - p[1]))
        if point_in_rings(x, y, rings):
            return x, y
    # best-effort fallback (degenerate geometry with no verifiable interior)
    return float(p[0]), float(p[1])


def _scanline_crossings(y: float, rings: RingList) -> np.ndarray:
    xs = []
    for ring in rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        cond = (y0 <= y) != (y1 <= y)
        if cond.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = x0[cond] + (y - y0[cond]) * (x1[cond] - x0[cond]) / (y1[cond] - y0[cond])
            xs.append(xi)
    if not xs:
        return np.empty(0)
    return np.sort(np.concatenate(xs))


# ---------------------------------------------------------------------------
# validity gate (check_bad_geom analogue)
# ---------------------------------------------------------------------------

def _segments_properly_intersect(p1, p2, p3, p4) -> tuple[bool, float, float]:
    d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
    d2x, d2y = p4[0] - p3[0], p4[1] - p3[1]
    denom = d1x * d2y - d1y * d2x
    if denom == 0.0:
        return False, 0.0, 0.0
    t = ((p3[0] - p1[0]) * d2y - (p3[1] - p1[1]) * d2x) / denom
    u = ((p3[0] - p1[0]) * d1y - (p3[1] - p1[1]) * d1x) / denom
    if 0.0 < t < 1.0 and 0.0 < u < 1.0:
        return True, p1[0] + t * d1x, p1[1] + t * d1y
    return False, 0.0, 0.0


def ring_self_intersection(ring: Ring) -> tuple[float, float] | None:
    """First proper self-intersection of a ring (O(E^2) pairwise; boundary
    rings are small after simplification). Returns the intersection point so
    the reason string matches the reference grammar
    ``Self-intersection[x y]`` (exposm/utils.py:105-115)."""
    n = len(ring) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent through the closure point
            hit, x, y = _segments_properly_intersect(
                ring[i], ring[i + 1], ring[j], ring[j + 1]
            )
            if hit:
                return float(x), float(y)
    return None


def explain_validity(rings: RingList) -> str | None:
    """None if valid, else a reason string in the reference grammar:
    ``Self-intersection[<x> <y>]``, ``Too few points[<x> <y>]``,
    ``Non-finite coordinate[<x> <y>]`` (check_bad_geom, utils.py:51-70:
    any truthy reason => reject)."""
    if not rings:
        return BONKERS
    for ring in rings:
        if ring.ndim != 2 or ring.shape[1] != 2:
            return BONKERS
        if not np.isfinite(ring).all():
            bad = ring[~np.isfinite(ring).all(axis=1)][0]
            x = bad[0] if np.isfinite(bad[0]) else 0.0
            y = bad[1] if np.isfinite(bad[1]) else 0.0
            return f"Non-finite coordinate[{x:g} {y:g}]"
        if len(ring) < 4:
            return f"Too few points[{ring[0][0]:g} {ring[0][1]:g}]"
        if ring[0][0] != ring[-1][0] or ring[0][1] != ring[-1][1]:
            return f"Ring not closed[{ring[0][0]:g} {ring[0][1]:g}]"
    for ring in rings:
        if len(ring) <= 130:  # bound the O(E^2) check; big rings checked per-edge-bucket upstream
            hit = ring_self_intersection(ring)
            if hit is not None:
                return f"Self-intersection[{hit[0]:g} {hit[1]:g}]"
    return None


def parse_reason(reason: str) -> tuple[float, float] | None:
    """Round-trip of the reason grammar — reference parseReason
    (exposm/utils.py:105-115): extracts the problem point coordinates."""
    if reason == BONKERS or "[" not in reason:
        return None
    inner = reason[reason.index("[") + 1 : reason.rindex("]")]
    parts = inner.split()
    if len(parts) != 2:
        return None
    return float(parts[0]), float(parts[1])


def problem_link(lat: float, lon: float, zoom: int = 18) -> str:
    """osm.org deep link — reference genProblemLink (exposm/utils.py:118-126)."""
    return f"http://www.openstreetmap.org/?mlat={lat}&mlon={lon}#map={zoom}/{lat}/{lon}"


# ---------------------------------------------------------------------------
# simplify (Douglas-Peucker) + buffer with containment feedback
# ---------------------------------------------------------------------------

def douglas_peucker(ring: Ring, tolerance: float) -> Ring:
    """Iterative DP over a closed ring; endpoints kept, ring stays closed.
    Reference: ST_Simplify default tolerance 0.001 (manage.py:116-121)."""
    pts = ring
    n = len(pts)
    if n <= 4:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    # anchor a midpoint so a closed ring doesn't collapse to a segment
    keep[n // 2] = True
    stack = [(0, n // 2), (n // 2, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[i + 1 : j]
        a, b = pts[i], pts[j]
        ab = b - a
        L2 = ab @ ab
        if L2 == 0.0:
            d = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
        else:
            t = ((seg - a) @ ab) / L2
            t = np.clip(t, 0.0, 1.0)
            proj = a + t[:, None] * ab
            d = np.hypot(seg[:, 0] - proj[:, 0], seg[:, 1] - proj[:, 1])
        k = int(np.argmax(d))
        if d[k] > tolerance:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    out = pts[keep]
    if len(out) < 4:  # keep ring valid
        return pts
    return out


def simplify_rings(rings: RingList, tolerance: float) -> RingList:
    return [douglas_peucker(r, tolerance) for r in rings]


def buffer_ring(ring: Ring, dist: float) -> Ring:
    """Approximate outward buffer: scale each vertex away from the centroid
    by a distance-based factor. Coarse but monotone in ``dist`` — sufficient
    for the containment-feedback loop below (the reference only needs
    'buffered+simplified covers the original', extract_poly.py:51-69)."""
    cx, cy = ring[:-1, 0].mean(), ring[:-1, 1].mean()
    v = ring - np.array([cx, cy])
    norm = np.hypot(v[:, 0], v[:, 1])
    norm[norm == 0] = 1.0
    out = ring + v / norm[:, None] * dist
    out[-1] = out[0]
    return out


def simplify_covering(ring: Ring, buffer_dist: float, tolerance: float,
                      max_iter: int = 40) -> Ring:
    """checkGeom analogue (extract_poly.py:51-69): buffer then simplify;
    while the result does not contain the original, shrink tolerance 10%,
    and if still failing grow the buffer 10% — guarantees coverage."""
    buf = buffer_ring(ring, buffer_dist)
    sim = douglas_peucker(buf, tolerance)
    it = 0
    while not _ring_contains_ring(sim, ring):
        it += 1
        if it > max_iter:
            return buf  # unsimplified buffer always covers
        tolerance *= 0.9
        sim = douglas_peucker(buf, tolerance)
        if not _ring_contains_ring(sim, ring):
            buffer_dist *= 1.1
            buf = buffer_ring(ring, buffer_dist)
            sim = douglas_peucker(buf, tolerance)
    return sim


def _ring_contains_ring(outer: Ring, inner: Ring) -> bool:
    return bool(points_in_ring(inner[:-1, 0], inner[:-1, 1], outer).all())


def force_multi(rings_or_ring) -> RingList:
    """ForceToMultiPolygon analogue (extract_gadm.py:78): normalize a single
    ring to a ring list."""
    if isinstance(rings_or_ring, np.ndarray):
        return [rings_or_ring]
    return list(rings_or_ring)


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized haversine distance in meters (R=6371000)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * 6371000.0 * np.arcsin(np.sqrt(h))
