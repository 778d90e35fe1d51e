"""Boundary-extraction pipeline golden tests (posm extract.py semantics on
the deterministic raw fixture — SURVEY.md §5 rebuild test plan)."""

import pyarrow as pa
import pytest

from posm_ray.pipelines import boundary
from posm_ray.sources import boundaries as bsrc


@pytest.fixture(scope="module")
def result(ray_session):
    return boundary.extract_hierarchy(bsrc.raw_boundaries())


EXPECTED_L0 = {"R1000", "R2000", "R3000", "W90006"}
EXPECTED_L1 = {f"R{k}{s}00" for k in (1, 2, 3) for s in (1, 2, 3, 4)}
EXPECTED_L2 = {f"R{k}{s}{c}0" for k in (1, 2, 3)
               for s in (1, 2, 3, 4) for c in (1, 2, 3, 4)}


def test_level0_ids(result):
    assert set(result.levels[0]["osm_id"].to_pylist()) == EXPECTED_L0


def test_level1_ids(result):
    assert set(result.levels[1]["osm_id"].to_pylist()) == EXPECTED_L1


def test_level2_ids(result):
    assert set(result.levels[2]["osm_id"].to_pylist()) == EXPECTED_L2


def test_level1_parents(result):
    t = result.levels[1]
    for osm_id, is_in in zip(t["osm_id"].to_pylist(), t["is_in"].to_pylist()):
        assert is_in == f"R{osm_id[1]}000"


def test_level2_parents(result):
    t = result.levels[2]
    for osm_id, is_in in zip(t["osm_id"].to_pylist(), t["is_in"].to_pylist()):
        assert is_in == f"R{osm_id[1]}{osm_id[2]}00"


def test_name_receives_name_en(result):
    # extract.py:146-147 — the saved name column holds name_en
    t = result.levels[0]
    row = {r["osm_id"]: r for r in t.to_pylist()}
    assert row["R1000"]["name"] == "Aland"  # name_en, not "Aland Kingdom"
    assert row["R1000"]["name_en"] == "Aland"


def test_iso_uppercased(result):
    t = result.levels[0]
    isos = {r["osm_id"]: r["iso3166"] for r in t.to_pylist()}
    assert isos["R1000"] == "AA"  # raw fixture has lowercase 'aa'


def test_unusable_set(result):
    assert result.unusable == frozenset(
        {"R90001", "R90002", "R90003", "R90004", "R90005"})


def test_discards(result):
    rows = {r["osm_id"]: r for r in result.discards.to_pylist()}
    # non-BONKERS bad geometry keeps the RAW id (extract_all.py:57-64)
    assert rows["90001"]["reason"] == "Self-intersection[1 1]"
    assert rows["90002"]["reason"] == "Too few points[5 5]"
    # BONKERS rows are silently dropped from discards (extract_all.py:67-68)
    assert "90003" not in rows and "R90003" not in rows
    # missing-id row (extract_all.py:70-81)
    assert rows[None]["reason"] == "Feature without OSM_ID!"
    assert rows[None]["name"] == "Nowhere"


def test_problems(result):
    rows = {r["osm_id"]: r for r in result.problems.to_pylist()}
    assert set(rows) == {"R90001", "R90002", "R90003"}
    bow = rows["R90001"]
    assert bow["reason"] == "Self-intersection[1 1]"
    assert bow["link"] == ("http://www.openstreetmap.org/relation/90001"
                           "?mlat=1.0&mlon=1.0#map=18/1.0/1.0")
    assert (bow["lon"], bow["lat"]) == (1.0, 1.0)
    bonkers = rows["R90003"]
    assert bonkers["reason"] == "BONKERS!"
    # BONKERS -> (0,0) -> bare link (utils.py:145-151)
    assert bonkers["link"] == "http://www.openstreetmap.org/relation/90003"


def test_admin_mapping_override_applied(result):
    # country 2's override maps level 1 -> admin_level '3'; fixture rows for
    # country-2 states carry admin_level '3' and only they match
    t = result.levels[1]
    lv = {r["osm_id"]: r["adminlevel"] for r in t.to_pylist()}
    assert lv["R2100"] == 3
    assert lv["R1100"] == 4


def test_check_file_diffs(result, tmp_path):
    golden = {0: EXPECTED_L0 | {"R9999"}, 1: EXPECTED_L1, 2: EXPECTED_L2 - {"R1110"}}
    diffs = boundary.check_file_diffs(result.levels, golden)
    assert diffs[0]["missing"] == {"R9999"}
    assert diffs[0]["new"] == set()
    assert diffs[1] == {"missing": set(), "new": set()}
    assert diffs[2]["new"] == {"R1110"}
    boundary.write_check_files(diffs, str(tmp_path))
    assert (tmp_path / "admin_0_missing.txt").read_text() == "R9999\n"
    assert (tmp_path / "admin_2_new.txt").read_text() == "R1110\n"


def test_parse_reason_reference_grammar():
    assert boundary.parse_reason("Self-intersection[1.5 2.5]") == (1.5, 2.5)
    assert boundary.parse_reason("Ring Self-intersection[3 4]") == (3.0, 4.0)
    assert boundary.parse_reason("BONKERS!") == (0.0, 0.0)
    assert boundary.parse_reason("Too few points[5 5]") == (-1000.0, -1000.0)


def test_route_by_level(result, ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "routed")
    boundary.route_by_level(
        boundary.normalized(bsrc.raw_boundaries()), out)
    back = rd.read_parquet(out)
    df = back.to_pandas()
    # every usable feature routed to its admin_level partition 1..10
    # (hive partition values read back as strings)
    assert set(df["adminlevel_part"].astype(str)) == {"2", "3", "4", "5", "6", "7"}
    lvl2 = df[df["adminlevel_part"].astype(str) == "2"]
    assert "R90008" in set(lvl2["osm_id"])  # nameless but id'd: routed


class TestGadmHierarchy:
    """extract_gadm.py rebuild: 4-level PIP-parented acceptance."""

    def test_levels_and_parents(self):
        from posm_ray.pipelines import gadm
        from posm_ray.sources import boundaries as bsrc

        levels = gadm.extract_gadm_hierarchy(bsrc.gadm_tables())
        assert {k: levels[k].num_rows for k in levels} == {
            0: 3, 1: 12, 2: 48, 3: 192}
        # id suffixing: '{pcode}0' (extract_gadm.py:74)
        assert levels[0]["osm_id"].to_pylist() == ["AA0", "BB0", "CC0"]
        # every level-3 row's parent is an accepted level-2 id
        l2_ids = set(levels[2]["osm_id"].to_pylist())
        assert set(levels[3]["is_in"].to_pylist()) <= l2_ids

    def test_unusable_blocklist_skips(self):
        from posm_ray.pipelines import gadm
        from posm_ray.sources import boundaries as bsrc

        levels = gadm.extract_gadm_hierarchy(
            bsrc.gadm_tables(), unusable=frozenset({"AA.00"}))
        # state AA.0 skipped; its 4 counties lose their parent and drop,
        # and their 16 districts drop with them (drop-if-no-parent chain)
        assert levels[1].num_rows == 11
        assert levels[2].num_rows == 44
        assert levels[3].num_rows == 176

    def test_partial_archive(self):
        """<4 files: absent levels simply don't run (extract_gadm.py:259)."""
        from posm_ray.pipelines import gadm
        from posm_ray.sources import boundaries as bsrc

        t = bsrc.gadm_tables()
        levels = gadm.extract_gadm_hierarchy({0: t[0], 1: t[1]})
        assert sorted(levels) == [0, 1]


class TestBoundaryFromText:
    def test_extraction_is_byte_lossless(self, ray_session):
        """pages -> BoundaryFromText recovers the raw boundary table
        exactly, including the corrupt-WKB validity-gate row (hex
        passthrough) and every None attribute."""
        import ray

        from posm_ray.sources import boundaries as bsrc, synth
        from posm_ray.stages import extract as ex

        raw = bsrc.raw_boundaries()
        pages = ray.data.from_arrow(synth.boundary_pages())
        got = ex.boundaries_from_pages(pages)
        assert got.num_rows == raw.num_rows
        assert got.column_names == raw.column_names

        def keyed(t):
            rows = []
            for i in range(t.num_rows):
                rows.append(tuple(
                    (t.column(c)[i].as_py() if c != "geom_wkb"
                     else t.column(c)[i].as_py()) for c in t.column_names))
            return sorted(rows, key=lambda r: tuple(
                ("" if v is None else v.hex() if isinstance(v, bytes)
                 else str(v)) for v in r))

        assert keyed(got) == keyed(raw)
