"""Deconstruct / dissolve / simplify / export-sink tests (A1/A2/A6/K6/K7/J4)."""

import numpy as np
import pyarrow as pa
import pytest

from posm_ray.geom import kernels, wkb
from posm_ray.pipelines import boundary, dissolve, exports
from posm_ray.sources import boundaries as bsrc


@pytest.fixture(scope="module")
def levels(ray_session):
    return boundary.extract_hierarchy(bsrc.raw_boundaries()).levels


@pytest.fixture(scope="module")
def all_geom(levels):
    return dissolve.deconstruct_geometry(levels)


def test_all_geom_shape(all_geom):
    rows = all_geom.to_pylist()
    assert len(rows) == 64  # 12 fillers + 48 counties + 3 country fillers + W90006
    xxx = [r for r in rows if r["osm_id"].startswith("xxx")]
    assert len(xxx) == 15
    # tmp_id counter follows loop order: level-1 fillers first (0..11),
    # then level-0 fillers (12..14)  (proc_functions.sql tmp_id semantics)
    assert {r["osm_id"] for r in xxx} == {f"xxx{i}" for i in range(15)}
    state_fillers = [r for r in xxx if r["is_in_state"] is not None]
    assert len(state_fillers) == 12
    # childless country goes in directly (t_geom NULL branch)
    w = [r for r in rows if r["osm_id"] == "W90006"]
    assert len(w) == 1 and w[0]["is_in_state"] is None and w[0]["is_in_country"] is None


def test_filler_geometry_is_even_odd_difference(all_geom, levels):
    # the xxx filler for a state contains points in the state but outside
    # every county, and excludes points inside counties
    row = next(r for r in all_geom.to_pylist()
               if r["osm_id"].startswith("xxx") and r["is_in_state"] == "R1100")
    rings = wkb.wkb_to_rings(row["geom_wkb"])
    state = next(r for r in levels[1].to_pylist() if r["osm_id"] == "R1100")
    sminx, sminy = wkb.wkb_to_rings(state["geom_wkb"])[0].min(axis=0)
    # point just inside the state edge (county inset is 1 deg)
    assert kernels.point_in_rings(sminx + 0.5, sminy + 0.5, rings)
    # county interior point is a hole in the filler
    county = next(r for r in levels[2].to_pylist() if r["is_in"] == "R1100")
    crings = wkb.wkb_to_rings(county["geom_wkb"])
    cx = float(np.mean(crings[0][:-1, 0]))
    cy = float(np.mean(crings[0][:-1, 1]))
    assert not kernels.point_in_rings(cx, cy, rings)


def test_simplify_dissolve_tables(levels, all_geom):
    simple = dissolve.simplify_dissolve(levels, all_geom, tolerance=0.001)
    ids2 = simple[2]["osm_id"].to_pylist()
    assert len(ids2) == 48 and not any(i.startswith("xxx") for i in ids2)
    ids1 = simple[1]["osm_id"].to_pylist()
    assert sorted(i for i in ids1 if i) == sorted(
        [f"R{k}{s}00" for k in (1, 2, 3) for s in (1, 2, 3, 4)] + ["W90006"])
    ids0 = simple[0]["osm_id"].to_pylist()
    assert set(i for i in ids0 if i is not None) == {
        "R1000", "R2000", "R3000", "W90006"}
    assert ids0.count(None) == 1  # the SQL NULL-key GROUP BY row


def test_views_and_ancestry(levels, all_geom):
    simple = dissolve.simplify_dissolve(levels, all_geom)
    v2 = dissolve.simple_admin_view(levels, simple, 2)
    assert v2.num_rows == 48
    row = {r["osm_id"]: r for r in v2.to_pylist()}["R1110"]
    assert row["is_in_state"] == "R1100" and row["is_in_country"] == "R1000"
    assert row["wkb_geometry"] and row["natural_wkb_geometry"]
    anc = dissolve.ancestry(levels)
    assert anc.num_rows == 48
    a = {r["osm_id"]: r for r in anc.to_pylist()}["R2340"]
    assert a["is_in_state"] == "R2300" and a["is_in_country"] == "R2000"


def test_poly_text_golden():
    square = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                       [0.0, 0.0]])
    txt = exports.poly_text("AA_R1", [square])
    lines = txt.splitlines()
    assert lines[0] == "AA_R1"
    assert lines[1] == "1"
    assert lines[2] == "   0.000000E+00   0.000000E+00"
    assert lines[3] == "   1.000000E+00   0.000000E+00"
    assert lines[-2] == "END" and lines[-1] == "END"


def test_poly_inner_ring_marker():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]])
    txt = exports.poly_text("AA_R1", [outer, hole])
    lines = txt.splitlines()
    assert lines.count("1") == 1
    assert "!2" in lines  # inner ring marked (extract_poly.py:124-128)


def test_write_polys_skips_no_iso(levels, tmp_path):
    out = str(tmp_path / "poly")
    written = exports.write_polys(levels[0], out)
    # only level-0 rows with iso3166 (W90006's iso was only on the raw row
    # kept; countries carry AA/BB/CC)
    assert set(written) == {"AA_R1000", "BB_R2000", "CC_R3000", "XW_W90006"}
    body = (tmp_path / "poly" / "AA_R1000.poly").read_text()
    assert body.startswith("AA_R1000\n1\n")
    assert body.endswith("END\nEND\n")


def test_per_country_files(levels, all_geom, ray_session, tmp_path):
    simple = dissolve.simplify_dissolve(levels, all_geom)
    v2 = dissolve.simple_admin_view(levels, simple, 2)
    out = str(tmp_path / "countries")
    res = exports.per_country_files(v2, out).to_pandas()
    assert sorted(res["country"]) == ["R1000", "R2000", "R3000"]
    assert (res["n_features"] == 16).all()
    import json

    with open(f"{out}/R1000_admin2.json") as f:
        fc = json.load(f)
    assert len(fc["features"]) == 16
    assert fc["features"][0]["properties"]["is_in_country"] == "R1000"


def test_topojson_tree(levels, all_geom, ray_session, tmp_path):
    import json
    import os

    simple = dissolve.simplify_dissolve(levels, all_geom)
    v0 = dissolve.simple_admin_view(levels, simple, 0)
    v1 = dissolve.simple_admin_view(levels, simple, 1)
    v2 = dissolve.simple_admin_view(levels, simple, 2)
    # view0 lacks is_in_country; key country boundary lookup by osm_id
    out = str(tmp_path / "topo")
    res = exports.topojson_tree(v1, v2, out, view0=v0).to_pandas()
    assert len(res) > 0
    # nested layout: {out}/{ad0}/geometry.geojson and {out}/{ad0}/{ad1}/...
    countries = [d for d in os.listdir(out)
                 if os.path.isdir(os.path.join(out, d))]
    assert sorted(countries) == ["R1000", "R2000", "R3000"]
    with open(os.path.join(out, "R1000", "geometry.geojson")) as f:
        fc = json.load(f)
    # states + the country itself marked is_boundary=1 (last feature)
    assert fc["features"][-1]["properties"] == {
        "is_boundary": 1, "osm_id": "R1000"}
    state_dirs = [d for d in os.listdir(os.path.join(out, "R1000"))
                  if os.path.isdir(os.path.join(out, "R1000", d))]
    assert len(state_dirs) > 0
    sd = sorted(state_dirs)[0]
    with open(os.path.join(out, "R1000", sd, "geometry.geojson")) as f:
        fc1 = json.load(f)
    assert fc1["features"][-1]["properties"]["is_boundary"] == 1
    assert fc1["features"][-1]["properties"]["osm_id"] == sd
    # the CLI path is still documented as unavailable...
    with pytest.raises(NotImplementedError):
        exports.convert_to_topojson(out, require_cli=True)
    # ...but the pure-python encoder produced real topology.json files
    with open(os.path.join(out, "R1000", "topology.json")) as f:
        topo = json.load(f)
    assert topo["type"] == "Topology"
    assert len(topo["arcs"]) > 0
    geoms = topo["objects"]["boundaries"]["geometries"]
    assert geoms[-1]["id"] == "R1000"


def test_poly_format_matches_reference_golden():
    """Byte-identical reproduction of the reference's shipped .poly output
    (extractor/poly/NP_R184633.poly): parse the golden's coordinates, run
    them through our writer (exports.poly_text), and compare the full file
    byte for byte — name line, ring numbering, '   %.6E   %.6E' coords,
    END terminators."""
    import numpy as np

    golden_path = "/root/reference/extractor/poly/NP_R184633.poly"
    golden = open(golden_path).read()
    lines = golden.splitlines()
    name = lines[0]
    rings, cur = [], []
    for ln in lines[1:]:
        s = ln.strip()
        if s == "END":
            if cur:
                rings.append(np.array(cur, dtype=np.float64))
                cur = []
        elif s and not s.lstrip("!").isdigit():
            x, y = s.split()
            cur.append((float(x), float(y)))
    regenerated = exports.poly_text(name, rings)
    assert regenerated == golden


def test_country_archives(levels, all_geom, ray_session, tmp_path):
    """K7 complete layout: {country}admin{k}[_simplified].json x levels + a
    zip per country (generate_geojson.py:144-376)."""
    import json
    import os
    import zipfile

    simple = dissolve.simplify_dissolve(levels, all_geom)
    views = {k: dissolve.simple_admin_view(levels, simple, k)
             for k in (0, 1, 2)}
    out = str(tmp_path / "archives")
    written = exports.country_archives(views, out)
    for country in ("R1000", "R2000", "R3000"):
        for k in (0, 1, 2):
            assert f"{country}admin{k}.json" in written
            assert f"{country}admin{k}_simplified.json" in written
        zpath = os.path.join(out, f"{country}_exported_geojson.zip")
        with zipfile.ZipFile(zpath) as z:
            assert len(z.namelist()) == 6
    with open(os.path.join(out, "R1000admin2.json")) as f:
        fc = json.load(f)
    props = fc["features"][0]["properties"]
    assert set(props) == {"osm_id", "is_in_country", "is_in_state", "name",
                          "name_en", "iso3166", "parent_id"}
    assert props["is_in_country"] == "R1000"
    assert props["parent_id"] == props["is_in_state"]


def test_write_problems_geojson(ray_session, tmp_path):
    import json

    from posm_ray.pipelines import boundary
    from posm_ray.sources import boundaries as bsrc

    problems = boundary.problems_table(
        boundary.normalized(bsrc.raw_boundaries()))
    path = str(tmp_path / "problems.geojson")
    n = exports.write_problems_geojson(problems, path)
    assert n == problems.num_rows > 0
    with open(path) as f:
        fc = json.load(f)
    f0 = fc["features"][0]
    assert set(f0["properties"]) == {"osm_id", "reason", "link"}
    assert f0["geometry"]["type"] == "Point"
