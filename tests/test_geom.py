import numpy as np
import pytest

from posm_ray.geom import kernels, wkb
from posm_ray.geom.index import GridIndex

SQUARE = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=np.float64)
HOLE = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=np.float64)
HEX = np.array(
    [[2, 0], [4, 1], [4, 3], [2, 4], [0, 3], [0, 1], [2, 0]], dtype=np.float64
)
BOWTIE = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=np.float64)


class TestPIP:
    def test_square(self):
        px = np.array([2.0, 5.0, -1.0, 3.9])
        py = np.array([2.0, 2.0, 2.0, 3.9])
        got = kernels.points_in_ring(px, py, SQUARE)
        assert got.tolist() == [True, False, False, True]

    def test_hexagon(self):
        assert kernels.point_in_rings(2.0, 2.0, [HEX])
        assert not kernels.point_in_rings(3.9, 0.1, [HEX])
        assert not kernels.point_in_rings(-0.1, 2.0, [HEX])

    def test_hole_even_odd(self):
        rings = [SQUARE, HOLE]
        assert kernels.point_in_rings(0.5, 0.5, rings)  # in shell, not hole
        assert not kernels.point_in_rings(2.0, 2.0, rings)  # inside hole
        assert kernels.point_in_rings(3.5, 3.5, rings)

    def test_island_in_hole(self):
        island = np.array(
            [[1.5, 1.5], [2.5, 1.5], [2.5, 2.5], [1.5, 2.5], [1.5, 1.5]],
            dtype=np.float64,
        )
        rings = [SQUARE, HOLE, island]
        assert kernels.point_in_rings(2.0, 2.0, rings)


class TestReprPoint:
    def test_convex(self):
        x, y = kernels.representative_point([SQUARE])
        assert kernels.point_in_rings(x, y, [SQUARE])
        assert (x, y) == (2.0, 2.0)

    def test_lshape_centroid_outside(self):
        # U-shape whose centroid falls in the notch
        u = np.array(
            [[0, 0], [5, 0], [5, 5], [4, 5], [4, 1], [1, 1], [1, 5], [0, 5], [0, 0]],
            dtype=np.float64,
        )
        x, y = kernels.representative_point([u])
        assert kernels.point_in_rings(x, y, [u])

    def test_donut(self):
        rings = [SQUARE, HOLE]
        x, y = kernels.representative_point(rings)
        assert kernels.point_in_rings(x, y, rings)


class TestValidity:
    def test_valid(self):
        assert kernels.explain_validity([SQUARE]) is None
        assert kernels.explain_validity([HEX]) is None

    def test_self_intersection_reason_roundtrip(self):
        reason = kernels.explain_validity([BOWTIE])
        assert reason.startswith("Self-intersection[")
        pt = kernels.parse_reason(reason)
        assert pt == (1.0, 1.0)

    def test_too_few_points(self):
        tiny = np.array([[5, 5], [6, 5], [5, 5]], dtype=np.float64)
        reason = kernels.explain_validity([tiny])
        assert reason.startswith("Too few points[")

    def test_not_closed(self):
        open_ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
        assert kernels.explain_validity([open_ring]).startswith("Ring not closed[")

    def test_nonfinite(self):
        bad = SQUARE.copy()
        bad[2, 0] = np.nan
        assert kernels.explain_validity([bad]).startswith("Non-finite coordinate[")

    def test_empty_is_bonkers(self):
        assert kernels.explain_validity([]) == kernels.BONKERS

    def test_problem_link(self):
        link = kernels.problem_link(1.5, 2.5)
        assert "mlat=1.5" in link and "mlon=2.5" in link and "#map=18" in link


class TestSimplify:
    def test_dp_removes_collinear(self):
        ring = np.array(
            [[0, 0], [1, 0], [2, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
            dtype=np.float64,
        )
        out = kernels.douglas_peucker(ring, 0.001)
        assert len(out) < len(ring)
        assert (out[0] == out[-1]).all()

    def test_dp_keeps_corners(self):
        out = kernels.douglas_peucker(HEX, 0.001)
        assert len(out) == len(HEX)

    def test_dp_tolerance_monotone(self):
        t = np.linspace(0, 2 * np.pi, 101)
        circle = np.column_stack([np.cos(t), np.sin(t)])
        circle[-1] = circle[0]
        fine = kernels.douglas_peucker(circle, 0.001)
        coarse = kernels.douglas_peucker(circle, 0.5)
        assert len(coarse) < len(fine) <= len(circle)

    def test_simplify_covering_contains_original(self):
        t = np.linspace(0, 2 * np.pi, 41)
        blob = np.column_stack([2 * np.cos(t), np.sin(t)])
        blob[-1] = blob[0]
        sim = kernels.simplify_covering(blob, buffer_dist=0.1, tolerance=0.3)
        assert kernels.points_in_ring(blob[:-1, 0], blob[:-1, 1], sim).all()


class TestWkb:
    def test_roundtrip(self):
        rings = [SQUARE, HOLE]
        buf = wkb.rings_to_wkb(rings)
        out = wkb.wkb_to_rings(buf)
        assert len(out) == 2
        np.testing.assert_array_equal(out[0], SQUARE)
        np.testing.assert_array_equal(out[1], HOLE)

    def test_garbage_raises(self):
        with pytest.raises(ValueError):
            wkb.wkb_to_rings(b"\x01\x99\x00\x00\x00garbage")

    def test_plain_polygon(self):
        import struct

        buf = (
            struct.pack("<BII", 1, 3, 1)
            + struct.pack("<I", 5)
            + SQUARE.astype("<f8").tobytes()
        )
        out = wkb.wkb_to_rings(buf)
        np.testing.assert_array_equal(out[0], SQUARE)


class TestGridIndex:
    def test_lookup_and_tiebreak(self):
        a = SQUARE
        b = SQUARE + 10.0
        overlap = SQUARE + 0.5  # overlaps a
        idx = GridIndex(["R2", "R1", "R3"], [[a], [b], [overlap]])
        lat = np.array([2.0, 12.0, 3.1, 50.0])
        lon = np.array([2.0, 12.0, 3.1, 50.0])
        got = idx.query_points(lat, lon)
        # (3.1, 3.1) is inside both R2 (a) and R3 (overlap): min id R2 wins
        assert got.tolist() == ["R2", "R1", "R2", ""]

    def test_hexagon_membership(self):
        idx = GridIndex(["H"], [[HEX]])
        got = idx.query_points(np.array([2.0, 0.05]), np.array([2.0, 3.95]))
        assert got.tolist() == ["H", ""]


def test_haversine_known_distance():
    # Kathmandu -> Pokhara ~ 143.5 km
    d = kernels.haversine_m(27.7172, 85.324, 28.2096, 83.9856)
    assert 140_000 < float(d) < 147_000
    assert float(kernels.haversine_m(10.0, 20.0, 10.0, 20.0)) == 0.0


def test_force_multi():
    assert len(kernels.force_multi(SQUARE)) == 1
    assert len(kernels.force_multi([SQUARE, HOLE])) == 2
