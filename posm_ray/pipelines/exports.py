"""Export sinks: osmosis .poly writer (K6) and per-country fan-out (K7).

- ``poly_text`` / ``write_polys``: extract_poly.py:72-156 rebuilt — exact
  osmosis format: name line ``{ISO}_{osm_id}``, ring-number lines (inner
  rings prefixed '!'), coords formatted ``   %.6E   %.6E``, 'END' per ring
  and at file end; geometry is buffer+simplify with the containment
  feedback loop (checkGeom, extract_poly.py:51-69). Features without an
  ISO3166 code are skipped (extract_poly.py:74-77).
- ``per_country_files``: generate_geojson.py:144-376 rebuilt — the N
  filtered scans become ONE ``groupby('is_in_country').map_groups`` shuffle
  writing per-country JSON files (J5 mapping).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom import kernels, wkb


def format_coord(x: float, y: float) -> str:
    """``'   %.6E   %.6E' % (x, y)`` — extract_poly.py:135 (golden-sensitive
    float formatting, SURVEY.md §7.5.6)."""
    return "   %.6E   %.6E" % (x, y)


def poly_text(name: str, rings: list[np.ndarray]) -> str:
    """Osmosis poly body for one feature. Ring 0 of each part is outer
    (ring-number i+1); later rings inner ('!%d'). Our flat even-odd ring
    lists treat each ring as its own part's outer ring unless it is
    enclosed by the previous outer (then it's an inner ring)."""
    lines = [name]
    outer: np.ndarray | None = None
    idx_in_part = 0
    for ring in rings:
        p = ring[0]
        is_inner = (outer is not None
                    and kernels.points_in_ring(
                        np.array([p[0]]), np.array([p[1]]), outer)[0])
        if is_inner:
            idx_in_part += 1
            lines.append("!%d" % (idx_in_part + 1))
        else:
            outer = ring
            idx_in_part = 0
            lines.append("1")
        for x, y in ring:
            lines.append(format_coord(x, y))
        lines.append("END")
    lines.append("END")
    return "\n".join(lines) + "\n"


def build_poly(rings: list[np.ndarray], buffer_dist: float = 0.0,
               simplify_dist: float = 0.0) -> list[np.ndarray]:
    """Buffer+simplify with containment feedback per ring (checkGeom,
    extract_poly.py:51-69) when distances are set; passthrough otherwise."""
    if buffer_dist == 0.0 and simplify_dist == 0.0:
        return rings
    return [kernels.simplify_covering(r, buffer_dist, simplify_dist)
            for r in rings]


def write_polys(boundaries: pa.Table, out_dir: str, *,
                buffer_dist: float = 0.0, simplify_dist: float = 0.0) -> list[str]:
    """One .poly file per feature with an iso3166 code:
    ``{ISO}_{osm_id}.poly`` (extract_poly.py:79-81). Returns written names."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for r in boundaries.to_pylist():
        iso = r.get("iso3166")
        if not iso:
            continue  # extract_poly.py:74-77
        name = f"{iso}_{r['osm_id']}"
        rings = wkb.wkb_to_rings(r["geom_wkb"])
        rings = build_poly(rings, buffer_dist, simplify_dist)
        with open(os.path.join(out_dir, f"{name}.poly"), "w") as f:
            f.write(poly_text(name, rings))
        written.append(name)
    return written


# ---------------------------------------------------------------------------
# per-country fan-out (K7)
# ---------------------------------------------------------------------------

def per_country_files(view2, out_dir: str):
    """generate_geojson.py's per-country fan-out as one shuffle:
    level-2 view rows grouped by is_in_country; each group writes
    ``{country}_admin2.json`` with the fields the reference emits
    (osm_id, name, name_en, is_in_country, is_in_state) + ring GeoJSON.
    ``view2``: Dataset or Arrow table shaped like simple_admin_2_view."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    ds = rd.from_arrow(view2) if isinstance(view2, pa.Table) else view2

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        country = g["is_in_country"].iloc[0]
        features = []
        for r in g.sort_values("osm_id").itertuples():
            rings = wkb.wkb_to_rings(r.wkb_geometry)
            features.append({
                "type": "Feature",
                "properties": {
                    "osm_id": r.osm_id, "name": r.name,
                    "name_en": r.name_en,
                    "is_in_country": r.is_in_country,
                    "is_in_state": r.is_in_state,
                },
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [[np.asarray(ring).tolist()]
                                    for ring in rings],
                },
            })
        path = os.path.join(out_dir, f"{country}_admin2.json")
        with open(path, "w") as f:
            json.dump({"type": "FeatureCollection", "features": features},
                      f, sort_keys=True)
        return pd.DataFrame({"country": [country], "n_features": [len(features)]})

    return ds.groupby("is_in_country").map_groups(
        write_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# TopoJSON prep tree (K8)
# ---------------------------------------------------------------------------

def _geojson_feature(osm_id: str, rings, is_boundary: bool = False) -> dict:
    props = {"osm_id": osm_id}
    if is_boundary:
        props["is_boundary"] = 1  # prepare_topojson.py:137-141, 155-159
    return {
        "type": "Feature",
        "properties": props,
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [[np.asarray(r).tolist()] for r in rings],
        },
    }


def convert_to_topojson(path: str, require_cli: bool = False) -> bool:
    """Convert ``{path}/geometry.geojson`` to ``{path}/topology.json``.

    The reference shells to the node ``topojson`` CLI
    (prepare_topojson.py:62-75); that binary does not exist here, so the
    conversion runs the repo's pure-python shared-arc encoder
    (geom.topology.build_topology — join/cut/dedup per the public TopoJSON
    spec). ``require_cli=True`` still raises, documenting the CLI path the
    reference used. Returns True when topology.json was written."""
    if require_cli:
        raise NotImplementedError(
            "node 'topojson' CLI unavailable; pure-python encoder used "
            "instead (geom/topology.py); inputs at " + path)
    src = os.path.join(path, "geometry.geojson")
    if not os.path.exists(src):
        return False
    from ..geom import topology as topo

    with open(src) as f:
        fc = json.load(f)
    feats = []
    for ft in fc.get("features", []):
        rings = [np.asarray(ring, dtype=np.float64)
                 for poly in ft["geometry"]["coordinates"] for ring in poly]
        feats.append({"id": ft["properties"].get("osm_id"),
                      "rings": rings, "properties": ft["properties"]})
    t = topo.build_topology(feats)
    with open(os.path.join(path, "topology.json"), "w") as f:
        json.dump(t, f, sort_keys=True)
    return True


def topojson_tree(view1, view2, out_dir: str, view0=None):
    """prepare_topojson.py:78-162 rebuilt: nested dirs
    ``{out}/{ad0}/geometry.geojson`` (one feature per state + the country
    marked ``is_boundary=1`` last) and ``{out}/{ad0}/{ad1}/geometry.geojson``
    (one feature per county + the state marked ``is_boundary=1``).

    The reference's N filtered scans become ONE pass over the level-2 view
    grouped by (country, state) plus one pass over the level-1 view grouped
    by country — the J5 mapping. Returns a Dataset of (dir, n_features)
    rows (one per written file).

    ``view1``/``view2``: Arrow tables shaped like simple_admin_{1,2}_view;
    ``view0`` (optional): simple_admin_0_view, used for the country
    ``is_boundary=1`` rows (prepare_topojson.py:155-159).
    """
    import ray.data as rd

    from ..util import hash_rollup

    os.makedirs(out_dir, exist_ok=True)
    # state geometry lookup for the is_boundary rows (small side)
    state_geom = {r["osm_id"]: (r["wkb_geometry"], r["is_in_country"])
                  for r in view1.to_pylist()}
    country_geom = ({r["osm_id"]: r["wkb_geometry"] for r in view0.to_pylist()}
                    if view0 is not None else {})

    def write_state_files(part: pd.DataFrame) -> pd.DataFrame:
        dirs, counts = [], []
        for (country, state), g in part.groupby(
                ["is_in_country", "is_in_state"], sort=False):
            d = os.path.join(out_dir, str(country), str(state))
            os.makedirs(d, exist_ok=True)
            feats = [
                _geojson_feature(r.osm_id, wkb.wkb_to_rings(r.wkb_geometry))
                for r in g.sort_values("osm_id").itertuples()
            ]
            sg = state_geom.get(state)
            if sg is not None:
                feats.append(_geojson_feature(
                    state, wkb.wkb_to_rings(sg[0]), is_boundary=True))
            with open(os.path.join(d, "geometry.geojson"), "w") as f:
                json.dump({"type": "FeatureCollection", "features": feats},
                          f, sort_keys=True)
            convert_to_topojson(d)
            dirs.append(d)
            counts.append(len(feats))
        return pd.DataFrame({"dir": dirs, "n_features": counts})

    ds2 = rd.from_arrow(view2) if isinstance(view2, pa.Table) else view2
    state_files = hash_rollup(ds2, ["is_in_country", "is_in_state"],
                              write_state_files, npartitions=8)

    def write_country_files(part: pd.DataFrame) -> pd.DataFrame:
        dirs, counts = [], []
        for country, g in part.groupby("is_in_country", sort=False):
            d = os.path.join(out_dir, str(country))
            os.makedirs(d, exist_ok=True)
            feats = [
                _geojson_feature(r.osm_id, wkb.wkb_to_rings(r.wkb_geometry))
                for r in g.sort_values("osm_id").itertuples()
            ]
            cg = country_geom.get(country)
            if cg is not None:
                feats.append(_geojson_feature(
                    country, wkb.wkb_to_rings(cg), is_boundary=True))
            with open(os.path.join(d, "geometry.geojson"), "w") as f:
                json.dump({"type": "FeatureCollection", "features": feats},
                          f, sort_keys=True)
            convert_to_topojson(d)
            dirs.append(d)
            counts.append(len(feats))
        return pd.DataFrame({"dir": dirs, "n_features": counts})

    ds1 = rd.from_arrow(view1) if isinstance(view1, pa.Table) else view1
    country_files = hash_rollup(ds1, ["is_in_country"], write_country_files,
                                npartitions=4)
    return state_files.union(country_files)


# ---------------------------------------------------------------------------
# full per-country archive (K7 complete layout)
# ---------------------------------------------------------------------------

def _country_feature(r: dict, geom_key: str) -> dict:
    """Feature with the reference's field set (generate_geojson.py:190-196:
    osm_id, is_in_country, is_in_state, name, name_en, iso3166, parent_id)."""
    rings = wkb.wkb_to_rings(r[geom_key])
    return {
        "type": "Feature",
        "properties": {
            "osm_id": r.get("osm_id"),
            "is_in_country": r.get("is_in_country"),
            "is_in_state": r.get("is_in_state"),
            "name": r.get("name"),
            "name_en": r.get("name_en"),
            "iso3166": r.get("iso3166"),
            "parent_id": r.get("is_in_state") or r.get("is_in_country"),
        },
        "geometry": {"type": "MultiPolygon",
                     "coordinates": [[np.asarray(x).tolist()] for x in rings]},
    }


def country_archives(views: dict, out_dir: str):
    """generate_geojson.py:144-376 complete rebuild: per country, per level
    k in the views, TWO files ``{country}admin{k}.json`` (natural geometry)
    and ``{country}admin{k}_simplified.json`` (simplified), then a
    ``{country}_exported_geojson.zip`` of that country's files. The N
    filtered scans become one grouped pass per level.

    Deviation: the archive uses python's zipfile (reference shells to the
    ``zip`` CLI, generate_geojson.py:119-132 — unavailable here).
    Returns list of written file names."""
    import zipfile

    os.makedirs(out_dir, exist_ok=True)
    per_country: dict[str, list[str]] = {}

    def write_level(level: int, table: pa.Table):
        rows = table.to_pylist()
        groups: dict[str, list[dict]] = {}
        for r in rows:
            country = r["osm_id"] if level == 0 else r["is_in_country"]
            groups.setdefault(country, []).append(r)
        for country, rs in groups.items():
            rs = sorted(rs, key=lambda r: r["osm_id"])
            for suffix, geom_key in (("", "natural_wkb_geometry"),
                                     ("_simplified", "wkb_geometry")):
                fname = f"{country}admin{level}{suffix}.json"
                feats = [_country_feature(r, geom_key) for r in rs]
                with open(os.path.join(out_dir, fname), "w") as f:
                    json.dump({"type": "FeatureCollection",
                               "features": feats}, f, sort_keys=True)
                per_country.setdefault(country, []).append(fname)

    for level in sorted(views):
        write_level(level, views[level])

    written = []
    for country, files in sorted(per_country.items()):
        zname = f"{country}_exported_geojson.zip"
        with zipfile.ZipFile(os.path.join(out_dir, zname), "w",
                             zipfile.ZIP_DEFLATED) as z:
            for fname in sorted(files):
                z.write(os.path.join(out_dir, fname), arcname=fname)
        written.extend(files + [zname])
    return written


# ---------------------------------------------------------------------------
# problems GeoJSON file sink (K5 file form)
# ---------------------------------------------------------------------------

def write_problems_geojson(problems: pa.Table, path: str) -> int:
    """K5 file sink (exposm/utils.py:73-102, 129-153): Point layer
    (osm_id, reason, link); the point comes from the coords parsed out of
    the validity reason (parse_reason)."""
    from .boundary import parse_reason

    feats = []
    for r in problems.to_pylist():
        x, y = parse_reason(r["reason"])
        feats.append({
            "type": "Feature",
            "properties": {"osm_id": r["osm_id"], "reason": r["reason"],
                           "link": r["link"]},
            "geometry": {"type": "Point", "coordinates": [x, y]},
        })
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f,
                  sort_keys=True)
    return len(feats)
