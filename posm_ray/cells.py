"""Hierarchical cell index (H3-style resolutions) + S2-style bbox covering.

No H3/S2 libraries exist in this environment (SURVEY.md §7.0), so this is a
from-scratch deterministic hierarchical grid with the properties the engine
needs: fixed resolutions, exact parent/child containment, integer cell ids,
and — critically for the DuckDB oracle — a cell function expressible as plain
arithmetic SQL, so Ray results and DuckDB results are bit-identical.

Scheme
------
At resolution ``r`` (0..15) the globe is an equirectangular grid of
``ncols = 2**(r+7)`` longitude columns x ``nrows = 2**(r+6)`` latitude rows.
Cell sizes: r=7 -> 0.0220 deg (~2.4 km at the equator, H3-res-7-ish);
r=9 -> 0.0055 deg (~0.6 km, H3-res-9-ish).

    ix = min(floor((lon + 180.0) / 360.0 * ncols), ncols - 1)
    iy = min(floor((lat +  90.0) / 180.0 * nrows), nrows - 1)
    cell = (r << 48) | (ix << 24) | iy

Parent/child is exact bit math: parent(cell) halves ix and iy. The packed id
fits easily in int64 (r<=15 needs 4 bits; ix at r=15 needs 22 bits < 24).

The floating-point expression is written with the SAME operation order in
:func:`cell_sql` so DuckDB computes identical IEEE doubles.

Reference analogue: posm has no cell index; its 'raster move' is
``ST_SnapToGrid(geom, 0.00005)`` (POSMmanagement/process.py:85-102), which
:func:`snap_to_grid` generalizes. The covering generalizes the bbox envelope
step of its rtree probe (exposm/utils.py:38-48).
"""

from __future__ import annotations

import numpy as np

MIN_RES = 0
MAX_RES = 15

_RES_SHIFT = 48
_IX_SHIFT = 24
_IX_MASK = (1 << 24) - 1


def ncols(res: int) -> int:
    return 1 << (res + 7)


def nrows(res: int) -> int:
    return 1 << (res + 6)


def cell_width_deg(res: int) -> float:
    return 360.0 / ncols(res)


def cell_id(lat, lon, res: int) -> np.ndarray:
    """Vectorized lat/lon (degrees, EPSG:4326) -> int64 cell id at ``res``."""
    if not (MIN_RES <= res <= MAX_RES):
        raise ValueError(f"res must be in [{MIN_RES}, {MAX_RES}], got {res}")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    nx, ny = ncols(res), nrows(res)
    # NOTE: op order matches cell_sql() exactly for bit-identical doubles.
    # Non-finite coords clamp to cell (0,0) deterministically — callers are
    # expected to filter geocode failures before cell assignment.
    with np.errstate(invalid="ignore"):
        ix = np.nan_to_num(np.floor((lon + 180.0) / 360.0 * nx),
                           nan=0.0, posinf=float(nx), neginf=0.0).astype(np.int64)
        iy = np.nan_to_num(np.floor((lat + 90.0) / 180.0 * ny),
                           nan=0.0, posinf=float(ny), neginf=0.0).astype(np.int64)
    ix = np.minimum(np.maximum(ix, 0), nx - 1)
    iy = np.minimum(np.maximum(iy, 0), ny - 1)
    return (np.int64(res) << _RES_SHIFT) | (ix << _IX_SHIFT) | iy


def cell_sql(lat_expr: str, lon_expr: str, res: int) -> str:
    """ANSI-SQL (DuckDB) expression computing the same int64 cell id.

    Uses the same operation order as :func:`cell_id`, so the doubles (and
    therefore the floors) are bit-identical between numpy and DuckDB.
    """
    nx, ny = ncols(res), nrows(res)
    ix = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {nx}) "
        f"AS BIGINT), 0), {nx - 1})"
    )
    iy = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * {ny}) "
        f"AS BIGINT), 0), {ny - 1})"
    )
    return (
        f"(CAST({res} AS BIGINT) << {_RES_SHIFT}) | ({ix} << {_IX_SHIFT}) | {iy}"
    )


def cell_res(cell) -> np.ndarray:
    return np.asarray(cell, dtype=np.int64) >> _RES_SHIFT


def cell_ixy(cell) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    return (cell >> _IX_SHIFT) & _IX_MASK, cell & ((1 << _IX_SHIFT) - 1)


def parent(cell, parent_res: int | None = None) -> np.ndarray:
    """Parent cell id; exact hierarchical containment (ix, iy halve per step)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    if parent_res is None:
        pres = res - 1
    else:
        pres = np.full_like(res, parent_res)
    if np.any(pres < MIN_RES) or np.any(pres > res):
        raise ValueError("parent_res out of range")
    shift = res - pres
    ix, iy = cell_ixy(cell)
    return (pres << _RES_SHIFT) | ((ix >> shift) << _IX_SHIFT) | (iy >> shift)


def pack(res: int, ix, iy) -> np.ndarray:
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    return (np.int64(res) << _RES_SHIFT) | (ix << _IX_SHIFT) | iy


def cell_bounds(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(minx, miny, maxx, maxy) in degrees for each cell."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    ix, iy = cell_ixy(cell)
    nx = np.left_shift(np.int64(1), res + 7).astype(np.float64)
    ny = np.left_shift(np.int64(1), res + 6).astype(np.float64)
    minx = ix / nx * 360.0 - 180.0
    maxx = (ix + 1) / nx * 360.0 - 180.0
    miny = iy / ny * 180.0 - 90.0
    maxy = (iy + 1) / ny * 180.0 - 90.0
    return minx, miny, maxx, maxy


def covering(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """S2-style covering: all cell ids at ``res`` intersecting the bbox.

    Used to register boundary polygons in the per-actor grid index and to
    compute kNN halo shards. The bbox is treated as closed; the cell grid is
    half-open, so edge-touching cells are included (safe over-covering).

    A bbox crossing the antimeridian (minx > maxx, e.g. Fiji) splits into
    two coverings, [minx, 180] and [-180, maxx] — previously such boxes
    silently produced an EMPTY covering and dropped out of the grid index.
    ``neighbors`` wraps longitude the same way.
    """
    if minx > maxx:
        west = covering(minx, miny, 180.0, maxy, res)
        east = covering(-180.0, miny, maxx, maxy, res)
        return np.unique(np.concatenate([west, east]))
    nx, ny = ncols(res), nrows(res)
    ix0 = int(min(max(np.floor((minx + 180.0) / 360.0 * nx), 0), nx - 1))
    ix1 = int(min(max(np.floor((maxx + 180.0) / 360.0 * nx), 0), nx - 1))
    iy0 = int(min(max(np.floor((miny + 90.0) / 180.0 * ny), 0), ny - 1))
    iy1 = int(min(max(np.floor((maxy + 90.0) / 180.0 * ny), 0), ny - 1))
    ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(ixs, iys, indexing="ij")
    return pack(res, gx.ravel(), gy.ravel())


def neighbors(cell) -> np.ndarray:
    """The 3x3 block of cells around each cell (incl. itself), clamped at the
    poles and wrapped in longitude — the kNN halo (SURVEY.md J7)."""
    cell = np.asarray(cell, dtype=np.int64).ravel()
    res = int(cell_res(cell[0]))
    nx, ny = ncols(res), nrows(res)
    ix, iy = cell_ixy(cell)
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            jx = (ix + dx) % nx  # wrap antimeridian
            jy = np.minimum(np.maximum(iy + dy, 0), ny - 1)
            out.append(pack(res, jx, jy))
    return np.unique(np.concatenate(out))


def snap_to_grid(coords, grid: float = 0.00005) -> np.ndarray:
    """Coordinate quantization — ST_SnapToGrid analogue
    (reference POSMmanagement/process.py:85-102, default grid
    manage.py:156-160)."""
    coords = np.asarray(coords, dtype=np.float64)
    return np.round(coords / grid) * grid
