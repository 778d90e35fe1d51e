"""Pure-python shapefile/.dbf/GeoJSON ingestion (sources.shapefile):
round-trips, GADM-archive extraction feeding the gadm pipeline, and the
reference's real nepal_2.geojson fixture."""

import os
import zipfile

import numpy as np
import pyarrow as pa
import pytest

NEPAL2 = "/root/reference/nepal/nepal_2.geojson"
NEPAL3 = "/root/reference/nepal/nepal_3.geojson"


class TestShpRoundTrip:
    def test_polygon_roundtrip(self, tmp_path):
        from posm_ray.sources import shapefile as shp

        rings_a = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0],
                             [0.0, 4.0], [0.0, 0.0]]),
                   np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0],
                             [1.0, 1.0]])]
        rings_b = [np.array([[10.0, 10.0], [12.0, 10.0], [11.0, 12.0],
                             [10.0, 10.0]])]
        base = str(tmp_path / "t")
        shp.write_shp(base + ".shp", [rings_a, rings_b])
        got = shp.read_shp(base + ".shp")
        assert len(got) == 2
        for want, have in zip([rings_a, rings_b], got):
            assert len(want) == len(have)
            for w, h in zip(want, have):
                assert np.array_equal(w, h)

    def test_table_roundtrip(self, tmp_path):
        from posm_ray.geom import wkb
        from posm_ray.sources import shapefile as shp

        ring = [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])]
        t = pa.table({
            "NAME": pa.array(["Alpha", "Beta"], pa.string()),
            "CODE": pa.array(["A1", "B2"], pa.string()),
            "geom_wkb": pa.array([wkb.rings_to_wkb(ring)] * 2, pa.binary()),
        })
        base = str(tmp_path / "rt")
        shp.write_shapefile(base, t)
        back = shp.read_shapefile(base)
        assert back["NAME"].to_pylist() == ["Alpha", "Beta"]
        assert back["CODE"].to_pylist() == ["A1", "B2"]
        assert wkb.wkb_to_rings(back["geom_wkb"][0].as_py())[0].shape == (4, 2)


class TestGadmArchive:
    def _build_zip(self, tmp_path) -> str:
        """Write the GADM fixture tables as a real 4-shapefile zip with the
        reference's ADMx_PCODE/ADMx_EN field names (extract_gadm.py:74-77)."""
        from posm_ray.sources import boundaries as bsrc
        from posm_ray.sources import shapefile as shp

        d = tmp_path / "gadm"
        d.mkdir()
        for lvl, t in bsrc.gadm_tables().items():
            renamed = pa.table({
                f"ADM{lvl}_PCODE": t["pcode"],
                f"ADM{lvl}_EN": t["name_en"],
                "geom_wkb": t["geom_wkb"],
            })
            shp.write_shapefile(str(d / f"adm{lvl}"), renamed)
        zpath = str(tmp_path / "gadm.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            for f in sorted(os.listdir(d)):
                z.write(str(d / f), arcname=f)
        return zpath

    def test_archive_matches_fixture(self, tmp_path):
        from posm_ray.sources import boundaries as bsrc
        from posm_ray.sources import shapefile as shp

        tables = shp.gadm_tables_from_archive(self._build_zip(tmp_path))
        want = bsrc.gadm_tables()
        assert sorted(tables) == [0, 1, 2, 3]
        for lvl in range(4):
            assert tables[lvl]["pcode"].to_pylist() == \
                want[lvl]["pcode"].to_pylist()
            assert tables[lvl]["name_en"].to_pylist() == \
                want[lvl]["name_en"].to_pylist()
            assert tables[lvl]["geom_wkb"].to_pylist() == \
                want[lvl]["geom_wkb"].to_pylist()

    def test_hierarchy_from_archive_equals_fixture(self, tmp_path,
                                                   ray_session):
        from posm_ray.pipelines import gadm
        from posm_ray.sources import boundaries as bsrc
        from posm_ray.sources import shapefile as shp

        from_zip = gadm.extract_gadm_hierarchy(
            shp.gadm_tables_from_archive(self._build_zip(tmp_path)))
        from_fixture = gadm.extract_gadm_hierarchy(bsrc.gadm_tables())
        for lvl in sorted(from_fixture):
            a = from_zip[lvl].select(["osm_id", "adminlevel", "is_in"])
            b = from_fixture[lvl].select(["osm_id", "adminlevel", "is_in"])
            assert a.to_pylist() == b.to_pylist()


class TestNepalGeojson:
    @pytest.mark.skipif(not os.path.exists(NEPAL2),
                        reason="reference fixture absent")
    def test_nepal2_ingests(self):
        from posm_ray.geom import kernels, wkb
        from posm_ray.sources import shapefile as shp

        t = shp.read_geojson(NEPAL2)
        assert t.num_rows == 1
        props = set(t.column_names)
        assert {"osm_id", "name", "admin_level", "boundary"} <= props
        rings = wkb.wkb_to_rings(t["geom_wkb"][0].as_py())
        assert len(rings) >= 1
        minx, miny, maxx, maxy = kernels.rings_bbox(rings)
        # Nepal's bbox
        assert 79 < minx < maxx < 89 and 26 < miny < maxy < 31

    @pytest.mark.skipif(not os.path.exists(NEPAL3),
                        reason="reference fixture absent")
    def test_nepal3_shapefile_roundtrip(self, tmp_path):
        """GeoJSON -> our shapefile writer -> our reader: coordinates
        byte-identical."""
        from posm_ray.geom import wkb
        from posm_ray.sources import shapefile as shp

        t = shp.read_geojson(NEPAL3)
        assert t.num_rows >= 5
        base = str(tmp_path / "nepal3")
        cols = [c for c in ("osm_id", "name", "geom_wkb")
                if c in t.column_names]
        shp.write_shapefile(base, t.select(cols))
        back = shp.read_shapefile(base)
        assert back.num_rows == t.num_rows
        for i in range(t.num_rows):
            a = wkb.wkb_to_rings(t["geom_wkb"][i].as_py())
            b = wkb.wkb_to_rings(back["geom_wkb"][i].as_py())
            assert len(a) == len(b)
            for ra, rb in zip(a, b):
                assert np.array_equal(ra, rb)
