import duckdb
import numpy as np
import pytest

from posm_ray import cells


def test_cell_id_basic():
    c = cells.cell_id([0.0], [0.0], 7)
    assert cells.cell_res(c)[0] == 7
    ix, iy = cells.cell_ixy(c)
    assert ix[0] == cells.ncols(7) // 2
    assert iy[0] == cells.nrows(7) // 2


def test_cell_id_clamps_domain_edges():
    c = cells.cell_id([90.0, -90.0], [180.0, -180.0], 5)
    ix, iy = cells.cell_ixy(c)
    assert ix[0] == cells.ncols(5) - 1 and iy[0] == cells.nrows(5) - 1
    assert ix[1] == 0 and iy[1] == 0


def test_parent_containment():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-179, 179, 500)
    c9 = cells.cell_id(lat, lon, 9)
    c8 = cells.cell_id(lat, lon, 8)
    c7 = cells.cell_id(lat, lon, 7)
    assert (cells.parent(c9) == c8).all()
    assert (cells.parent(c9, 7) == c7).all()
    assert (cells.parent(c8) == c7).all()


def test_cell_bounds_roundtrip():
    rng = np.random.RandomState(11)
    lat = rng.uniform(-89, 89, 200)
    lon = rng.uniform(-179, 179, 200)
    for res in (3, 7, 9):
        c = cells.cell_id(lat, lon, res)
        minx, miny, maxx, maxy = cells.cell_bounds(c)
        assert ((lon >= minx) & (lon < maxx)).all()
        assert ((lat >= miny) & (lat < maxy)).all()


def test_covering_contains_point_cells():
    c = cells.covering(-1.0, -1.0, 1.0, 1.0, 6)
    pt = cells.cell_id([0.5], [0.5], 6)
    assert pt[0] in set(c.tolist())
    # covering of a cell's own bounds includes that cell
    minx, miny, maxx, maxy = (float(a[0]) for a in cells.cell_bounds(pt))
    c2 = cells.covering(minx + 1e-9, miny + 1e-9, maxx - 1e-9, maxy - 1e-9, 6)
    assert set(c2.tolist()) == {int(pt[0])}


def test_neighbors_halo():
    c = cells.cell_id([10.0], [10.0], 5)
    n = cells.neighbors(c)
    assert int(c[0]) in set(n.tolist())
    assert len(n) == 9
    # antimeridian wrap
    edge = cells.cell_id([0.0], [-179.999], 5)
    n2 = cells.neighbors(edge)
    assert len(n2) == 9


def test_cell_sql_matches_numpy():
    """The oracle contract: DuckDB computes bit-identical cell ids."""
    rng = np.random.RandomState(3)
    lat = np.round(rng.uniform(-90, 90, 2000), 4)
    lon = np.round(rng.uniform(-180, 180, 2000), 4)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lat": lat, "lon": lon}))
    for res in (0, 7, 9, 15):
        expected = cells.cell_id(lat, lon, res)
        got = con.execute(
            f"SELECT {cells.cell_sql('lat', 'lon', res)} AS c FROM pts"
        ).fetchnumpy()["c"]
        np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), expected)


def test_snap_to_grid():
    out = cells.snap_to_grid(np.array([1.000026, -0.000024]), 0.00005)
    np.testing.assert_allclose(out, [1.00005, 0.0], atol=1e-12)
