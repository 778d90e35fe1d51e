"""Property-based tests (hypothesis) for the numpy kernels the engine's
correctness rests on: cell index hierarchy, WKB codec, Douglas-Peucker,
minhash similarity, resize arithmetic."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from posm_ray import cells
from posm_ray.geom import kernels, wkb

lat_s = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lon_s = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
res_s = st.integers(min_value=1, max_value=12)


class TestCellProperties:
    @given(lat_s, lon_s, res_s)
    @settings(max_examples=200, deadline=None)
    def test_parent_contains_child(self, lat, lon, res):
        """A point's cell at res r has the point's cell at r-1 as parent."""
        child = cells.cell_id(np.array([lat]), np.array([lon]), res)
        parent_direct = cells.cell_id(np.array([lat]), np.array([lon]), res - 1)
        assert cells.parent(child, res - 1)[0] == parent_direct[0]

    @given(lat_s, lon_s, res_s)
    @settings(max_examples=200, deadline=None)
    def test_cell_bounds_contain_point(self, lat, lon, res):
        c = cells.cell_id(np.array([lat]), np.array([lon]), res)
        minx, miny, maxx, maxy = cells.cell_bounds(c)
        # slack: tiny coords (denormals) are absorbed by (coord+180) before
        # the floor, legitimately landing on the boundary cell
        assert minx[0] - 1e-9 <= lon <= maxx[0] + 1e-9
        assert miny[0] - 1e-9 <= lat <= maxy[0] + 1e-9

    @given(lat_s, lon_s, res_s)
    @settings(max_examples=100, deadline=None)
    def test_covering_includes_point_cell(self, lat, lon, res):
        c = cells.cell_id(np.array([lat]), np.array([lon]), res)
        cover = cells.covering(lon - 0.01, lat - 0.01, lon + 0.01,
                               lat + 0.01, res)
        assert c[0] in set(int(x) for x in cover)

    @given(lat_s, lon_s, res_s)
    @settings(max_examples=100, deadline=None)
    def test_neighbors_include_self(self, lat, lon, res):
        c = cells.cell_id(np.array([lat]), np.array([lon]), res)
        assert c[0] in set(int(x) for x in cells.neighbors(c))


coord_s = st.floats(min_value=-170.0, max_value=170.0, allow_nan=False)


@st.composite
def ring_strategy(draw):
    """A valid (closed, >=4 pts incl. closure) convex-ish ring."""
    cx = draw(coord_s)
    cy = draw(st.floats(min_value=-80.0, max_value=80.0, allow_nan=False))
    n = draw(st.integers(min_value=3, max_value=12))
    r = draw(st.floats(min_value=0.01, max_value=5.0, allow_nan=False))
    ang = np.sort(np.random.RandomState(draw(st.integers(0, 1000)))
                  .uniform(0, 2 * np.pi, n))
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    return np.vstack([pts, pts[:1]])


class TestGeomProperties:
    @given(ring_strategy())
    @settings(max_examples=100, deadline=None)
    def test_wkb_roundtrip(self, ring):
        back = wkb.wkb_to_rings(wkb.rings_to_wkb([ring]))
        assert len(back) == 1
        assert np.allclose(back[0], ring)

    @given(ring_strategy(), st.floats(min_value=0.001, max_value=1.0,
                                      allow_nan=False))
    @settings(max_examples=100, deadline=None)
    def test_simplify_keeps_ring_valid(self, ring, tol):
        out = kernels.simplify_rings([ring], tol)
        assert len(out) == 1
        s = out[0]
        # still closed, still >= 4 points (triangle + closure)
        assert np.array_equal(s[0], s[-1])
        assert len(s) >= 4
        # simplified vertices are a subset of the originals
        orig = {tuple(p) for p in ring}
        assert all(tuple(p) in orig for p in s)

    @given(ring_strategy())
    @settings(max_examples=50, deadline=None)
    def test_representative_point_inside(self, ring):
        px, py = kernels.representative_point([ring])
        assert kernels.point_in_rings(px, py, [ring])


class TestMinhashProperties:
    @given(st.text(alphabet="abcdef gh", min_size=30, max_size=120),
           st.integers(min_value=0, max_value=5))
    @settings(max_examples=50, deadline=None)
    def test_identical_texts_identical_sigs(self, text, _):
        from posm_ray.functions import hashing

        a = hashing.minhash_signature(hashing.shingles(text))
        b = hashing.minhash_signature(hashing.shingles(text))
        assert (a == b).all()


class TestResizeProperties:
    @given(st.integers(min_value=1, max_value=4096),
           st.integers(min_value=1, max_value=4096))
    @settings(max_examples=200, deadline=None)
    def test_resize_fits_and_preserves_aspect(self, w, h):
        from posm_ray.stages.multimodal import MediaResize

        nw, nh = MediaResize(max_w=64, max_h=64)._new_dims(w, h)
        assert 1 <= nw <= 64 and 1 <= nh <= 64
        if w > 64 or h > 64:
            # aspect preserved within integer floor slack
            assert abs(nw / nh - w / h) <= max(w / h, nw / nh)


class TestSqlTwinProperties:
    @given(st.lists(st.tuples(lat_s, lon_s), min_size=1, max_size=50),
           st.integers(min_value=1, max_value=12))
    @settings(max_examples=30, deadline=None)
    def test_cell_sql_matches_cell_id(self, coords, res):
        """The DuckDB twin of the cell function is bit-identical to the
        numpy kernel on arbitrary coordinates (identical IEEE op order)."""
        import duckdb

        lat = np.array([c[0] for c in coords])
        lon = np.array([c[1] for c in coords])
        ours = cells.cell_id(lat, lon, res)
        con = duckdb.connect()
        con.execute("CREATE TABLE pts (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)",
                        list(map(tuple, coords)))
        sql = con.execute(
            f"SELECT {cells.cell_sql('lat', 'lon', res)} FROM pts"
        ).fetchnumpy()
        theirs = list(sql.values())[0]
        assert (ours == theirs).all()

    @given(st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
           st.floats(min_value=-179.9, max_value=179.9, allow_nan=False))
    @settings(max_examples=100, deadline=None)
    def test_haversine_properties(self, lat, lon):
        from posm_ray.geom.kernels import haversine_m

        # self-distance zero; symmetry
        assert haversine_m(lat, lon, np.array([lat]), np.array([lon]))[0] < 1e-6
        d1 = haversine_m(lat, lon, np.array([0.0]), np.array([0.0]))[0]
        d2 = haversine_m(0.0, 0.0, np.array([lat]), np.array([lon]))[0]
        assert abs(d1 - d2) <= 1e-6 * max(1.0, d1)
