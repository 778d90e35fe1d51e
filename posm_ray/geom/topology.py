"""Pure-python TopoJSON shared-arc encoder (K8 completion).

The reference shells out to the node ``topojson`` CLI
(extractor/prepare_topojson.py:62-75); that binary doesn't exist here, so
this module implements the published TopoJSON topology construction
(https://github.com/topojson/topojson-specification, and the join/cut/dedup
phases of topojson-server) from scratch:

1. **join** — find junction points: a point is a junction when two ring
   traversals see it with different (unordered) neighbor pairs, i.e. paths
   meet or diverge there;
2. **cut** — split every ring at its junctions into arc segments (rings
   with no junction stay one closed arc, rotated to a deterministic start);
3. **dedup** — identical arcs (forward or reversed) are stored once;
   geometries reference arc ``i`` forward or ``~i`` reversed, per spec.

Arcs are emitted as absolute positions (no ``transform``), which the spec
permits and keeps coordinates byte-exact — the repo's golden-output
discipline (SURVEY.md §7.5.6). Shared borders between adjacent polygons
therefore become ONE arc referenced twice — the property the reference
gains from topology (proc_functions.sql:27-82) and the CLI conversion.
"""

from __future__ import annotations

import numpy as np

Pt = tuple[float, float]


def _ring_points(ring: np.ndarray) -> list[Pt]:
    """Closed ring -> point list WITHOUT the duplicate closure point."""
    pts = [(float(x), float(y)) for x, y in np.asarray(ring, dtype=np.float64)]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return pts


def _junctions(all_rings: list[list[Pt]]) -> set[Pt]:
    """Points whose neighbor context differs across traversals (the topojson
    'join' phase). Every occurrence of a point records its unordered
    (prev, next) pair; >1 distinct pair -> junction."""
    seen: dict[Pt, tuple[Pt, Pt] | None] = {}
    junctions: set[Pt] = set()
    for pts in all_rings:
        n = len(pts)
        if n < 2:
            continue
        for i, p in enumerate(pts):
            prev_p = pts[(i - 1) % n]
            next_p = pts[(i + 1) % n]
            pair = (prev_p, next_p) if prev_p <= next_p else (next_p, prev_p)
            if p not in seen:
                seen[p] = pair
            elif seen[p] != pair:
                junctions.add(p)
    return junctions


def _cut_ring(pts: list[Pt], junctions: set[Pt]) -> list[list[Pt]]:
    """Split one ring at junction points into arc point-lists. A ring with
    no junctions becomes one closed arc starting at its lexicographically
    smallest point (deterministic across input rotations)."""
    n = len(pts)
    idx = [i for i, p in enumerate(pts) if p in junctions]
    if not idx:
        start = min(range(n), key=lambda i: pts[i])
        rot = pts[start:] + pts[:start]
        return [rot + [rot[0]]]
    arcs = []
    for k in range(len(idx)):
        i, j = idx[k], idx[(k + 1) % len(idx)]
        if j > i:
            seg = pts[i:j + 1]
        else:
            seg = pts[i:] + pts[:j + 1]
        if len(seg) >= 2:
            arcs.append(seg)
    return arcs


class _ArcStore:
    def __init__(self):
        self.arcs: list[list[Pt]] = []
        self.index: dict[tuple, int] = {}

    def add(self, seg: list[Pt]) -> int:
        """Return the spec arc index: i if stored forward, ~i if this
        segment is the reverse of a stored arc."""
        key_f = tuple(seg)
        got = self.index.get(key_f)
        if got is not None:
            return got
        key_r = tuple(reversed(seg))
        got = self.index.get(key_r)
        if got is not None:
            return ~got
        i = len(self.arcs)
        self.arcs.append(seg)
        self.index[key_f] = i
        return i


def build_topology(features: list[dict], object_name: str = "boundaries") -> dict:
    """``features``: [{"id": str, "rings": [np.ndarray ...],
    "properties": {...}}] -> TopoJSON Topology dict. Each ring becomes one
    MultiPolygon part (the repo's flat even-odd ring representation)."""
    ring_pts = [[_ring_points(r) for r in f["rings"]] for f in features]
    junctions = _junctions([pts for rl in ring_pts for pts in rl])
    store = _ArcStore()
    geometries = []
    for f, rl in zip(features, ring_pts):
        parts = []
        for pts in rl:
            arc_ids = [store.add(seg) for seg in _cut_ring(pts, junctions)]
            parts.append([arc_ids])
        geom = {"type": "MultiPolygon", "arcs": parts, "id": f.get("id")}
        if f.get("properties"):
            geom["properties"] = f["properties"]
        geometries.append(geom)
    return {
        "type": "Topology",
        "objects": {object_name: {"type": "GeometryCollection",
                                  "geometries": geometries}},
        "arcs": [[[x, y] for x, y in seg] for seg in store.arcs],
    }


def topology_stats(topo: dict, object_name: str = "boundaries") -> dict:
    """Arc-sharing statistics: total arcs and arcs referenced by more than
    one geometry (the shared borders the topology exists to deduplicate —
    the reference builds these via PostGIS toTopoGeom,
    proc_functions.sql:27-82)."""
    use_count: dict[int, set] = {}
    for gi, geom in enumerate(topo["objects"][object_name]["geometries"]):
        for part in geom["arcs"]:
            for ring_arcs in part:
                for ai in ring_arcs:
                    use_count.setdefault(ai if ai >= 0 else ~ai,
                                         set()).add(gi)
    shared = sum(1 for users in use_count.values() if len(users) > 1)
    return {"n_arcs": len(topo["arcs"]), "n_shared_arcs": shared}


def topology_to_rings(topo: dict, object_name: str = "boundaries"
                      ) -> list[tuple[str, list[np.ndarray]]]:
    """Inverse (for round-trip tests): reassemble each geometry's rings."""
    arcs = topo["arcs"]
    out = []
    for geom in topo["objects"][object_name]["geometries"]:
        rings = []
        for part in geom["arcs"]:
            for ring_arcs in part:
                pts: list[Pt] = []
                for ai in ring_arcs:
                    seg = arcs[ai] if ai >= 0 else list(reversed(arcs[~ai]))
                    seg = [(p[0], p[1]) for p in seg]
                    if pts and pts[-1] == seg[0]:
                        pts.extend(seg[1:])
                    else:
                        pts.extend(seg)
                if pts[0] != pts[-1]:
                    pts.append(pts[0])
                rings.append(np.asarray(pts, dtype=np.float64))
        out.append((geom.get("id"), rings))
    return out
