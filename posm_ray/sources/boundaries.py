"""Synthetic admin-boundary fixtures (FIXTURES.md §2, nepal-shaped).

Two tables, both deterministic (no RNG needed — closed-form from indices):

1. ``clean_boundaries()`` — the post-extraction hierarchy used by the PIP
   join: 3 countries x 4 states x 4 counties as axis-aligned rectangles whose
   every edge coordinate ends in ...0.00005, so no synthetic document point
   (4-decimal coords) can ever lie on an edge — PIP results are therefore
   identical between the ray-crossing kernel and the DuckDB bbox oracle.
   States are inset 2 deg inside their country and counties 1 deg inside
   their state, so marginal points have a country but no state (exercises
   posm's drop-if-no-parent semantics, extract.py:211-243).

2. ``raw_boundaries()`` — the messy pre-extraction input for the
   posm-semantics boundary pipeline: layer-tagged raw ids (M1,
   exposm/utils.py:13-35), missing name_en (M2), lowercase iso (M3), invalid
   geometries with reference reason strings (M4, exposm/utils.py:51-70),
   non-administrative boundary tags (M5, extract.py:128-137), admin_level
   strings incl. per-country mapping overrides (M6, admin_mapping.yaml).

Schema follows the reference AdminLevelWriter (exposm/writer.py:125-147).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import wkb

OFF = 0.00005  # every boundary coord ends in .00005 (see module docstring)

# (key, name, iso, minx, miny) — 60x60 deg countries
_COUNTRIES = [
    (1, "Aland", "AA", -170.0 + OFF, -70.0 + OFF),
    (2, "Bestan", "BB", -90.0 + OFF, -60.0 + OFF),
    (3, "Cestan", "CC", 60.0 + OFF, 0.0 + OFF),  # contains the mega-cell point
]
COUNTRY_SIZE = 60.0
STATE_INSET = 2.0
COUNTY_INSET = 1.0

# per-country admin-level mapping (admin_mapping.yaml analogue: default
# {admin_level_1: 4, admin_level_2: 6} with an override for country 2)
ADMIN_MAPPING_DEFAULT = {"admin_level_1": "4", "admin_level_2": "6"}
ADMIN_MAPPING_OVERRIDES = {"R2000": {"admin_level_1": "3", "admin_level_2": "5"}}


def country_id(k: int) -> str:
    return f"R{k}000"


def state_id(k: int, s: int) -> str:
    return f"R{k}{s + 1}00"


def county_id(k: int, s: int, c: int) -> str:
    return f"R{k}{s + 1}{c + 1}0"


def _rect(minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    return np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
        dtype=np.float64,
    )


def _quarters(minx, miny, maxx, maxy, inset):
    x0, y0, x1, y1 = minx + inset, miny + inset, maxx - inset, maxy - inset
    hw, hh = (x1 - x0) / 2.0, (y1 - y0) / 2.0
    out = []
    for qy in range(2):
        for qx in range(2):
            out.append((x0 + qx * hw, y0 + qy * hh, x0 + (qx + 1) * hw, y0 + (qy + 1) * hh))
    return out  # index s = qy*2 + qx


def iter_clean() -> list[dict]:
    """All 63 boundary rows as dicts with bbox + ring, hierarchy linked via
    ``is_in`` (reference writer.py:125-147 field; proc_functions.sql:337-362
    ancestry joins)."""
    rows: list[dict] = []
    for k, cname, iso, cx, cy in _COUNTRIES:
        cbox = (cx, cy, cx + COUNTRY_SIZE, cy + COUNTRY_SIZE)
        rows.append(dict(osm_id=country_id(k), name=f"{cname} Kingdom",
                         name_en=cname, adminlevel=0, iso3166=iso, is_in=None,
                         bbox=cbox))
        for s, sbox in enumerate(_quarters(*cbox, STATE_INSET)):
            rows.append(dict(osm_id=state_id(k, s), name=f"{cname} State {s}",
                             name_en=f"{cname}-S{s}", adminlevel=1, iso3166=None,
                             is_in=country_id(k), bbox=sbox))
            for c, dbox in enumerate(_quarters(*sbox, COUNTY_INSET)):
                rows.append(dict(osm_id=county_id(k, s, c),
                                 name=f"{cname} County {s}.{c}",
                                 name_en=f"{cname}-S{s}-C{c}", adminlevel=2,
                                 iso3166=None, is_in=state_id(k, s), bbox=dbox))
    return rows


def clean_boundaries() -> pa.Table:
    """Arrow boundaries table (geometry as WKB MultiPolygon rectangles)."""
    rows = iter_clean()
    return pa.table(
        {
            "osm_id": pa.array([r["osm_id"] for r in rows]),
            "name": pa.array([r["name"] for r in rows]),
            "name_en": pa.array([r["name_en"] for r in rows]),
            "adminlevel": pa.array([r["adminlevel"] for r in rows], pa.int32()),
            "iso3166": pa.array([r["iso3166"] for r in rows]),
            "is_in": pa.array([r["is_in"] for r in rows]),
            "geom_wkb": pa.array(
                [wkb.rings_to_wkb([_rect(*r["bbox"])]) for r in rows],
                pa.binary(),
            ),
        }
    )


def boundaries_values_sql(level: int) -> str:
    """DuckDB VALUES clause ``(osm_id, parent_id, minx, miny, maxx, maxy)``
    for one admin level — inlined into oracle SQL (the boundary table is tiny
    and not among the driver's pre-registered views)."""
    rows = [r for r in iter_clean() if r["adminlevel"] == level]
    vals = ", ".join(
        "('{}', {}, {!r}, {!r}, {!r}, {!r})".format(
            r["osm_id"],
            "NULL" if r["is_in"] is None else f"'{r['is_in']}'",
            *r["bbox"],
        )
        for r in rows
    )
    return vals


# ---------------------------------------------------------------------------
# messy raw fixture for the posm-semantics boundary pipeline
# ---------------------------------------------------------------------------

_BOWTIE = np.array(
    [[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]], dtype=np.float64
)
_TINY = np.array([[5.0, 5.0], [6.0, 5.0], [5.0, 5.0]], dtype=np.float64)


def _raw_rows() -> list[dict]:
    """The raw-fixture row list shared by :func:`raw_boundaries` (Arrow
    table) and :func:`raw_values_sql` (oracle VALUES). Reject rows carry
    three FIXTURE-DESIGN constants — ``reason`` (the validity outcome the
    injected defect was constructed to produce), and ``plon``/``plat`` (the
    parse_reason coordinates of that reason string). These are part of the
    fixture's contract, not outputs of the kernel: the bowtie's diagonals
    cross at (1,1) by construction, the tiny ring starts at (5,5), the
    garbage WKB is BONKERS. Valid rows carry ``bbox``."""
    rows = []
    for r in iter_clean():
        level = r["adminlevel"]
        if level == 0:
            admin_level = "2"
        else:
            key = f"admin_level_{level}"
            mapping = ADMIN_MAPPING_OVERRIDES.get(
                country_id(int(r["osm_id"][1])), ADMIN_MAPPING_DEFAULT
            )
            admin_level = mapping[key]
        n = int(r["osm_id"][1:])
        name_en = r["name_en"]
        if level > 0 and (n // 10) % 7 == 0:
            name_en = None
        iso = r["iso3166"].lower() if r["iso3166"] else None
        rows.append(dict(layer="multipolygons", osm_id_raw=r["osm_id"][1:],
                         osm_way_id_raw=None, name=r["name"], name_en=name_en,
                         admin_level=admin_level, boundary="administrative",
                         iso3166=iso, bbox=r["bbox"], reason=None,
                         geom_wkb=wkb.rings_to_wkb([_rect(*r["bbox"])])))
    # --- reject / edge rows (deterministic) ---
    rows.append(dict(layer="multipolygons", osm_id_raw="90001", osm_way_id_raw=None,
                     name="Bowtie Land", name_en="Bowtie", admin_level="2",
                     boundary="administrative", iso3166="XX",
                     bbox=None, reason="Self-intersection[1 1]",
                     plon=1.0, plat=1.0,
                     geom_wkb=wkb.rings_to_wkb([_BOWTIE])))
    rows.append(dict(layer="multipolygons", osm_id_raw="90002", osm_way_id_raw=None,
                     name="Tiny Land", name_en="Tiny", admin_level="2",
                     boundary="administrative", iso3166="XY",
                     bbox=None, reason="Too few points[5 5]",
                     plon=-1000.0, plat=-1000.0,  # unparsed grammar branch
                     geom_wkb=wkb.rings_to_wkb([_TINY])))
    rows.append(dict(layer="multipolygons", osm_id_raw="90003", osm_way_id_raw=None,
                     name="Bonkers Land", name_en="Bonkers", admin_level="2",
                     boundary="administrative", iso3166="XZ",
                     bbox=None, reason="BONKERS!", plon=0.0, plat=0.0,
                     geom_wkb=b"\x01\x99\x00\x00\x00garbage"))
    rows.append(dict(layer="multipolygons", osm_id_raw="90004", osm_way_id_raw=None,
                     name="Maritime Zone", name_en="Maritime", admin_level="2",
                     boundary="maritime", iso3166="XM",
                     bbox=(130.00005, 10.00005, 140.00005, 20.00005), reason=None,
                     geom_wkb=wkb.rings_to_wkb([_rect(130.00005, 10.00005, 140.00005, 20.00005)])))
    rows.append(dict(layer="multipolygons", osm_id_raw="90005", osm_way_id_raw=None,
                     name="Old Empire", name_en="Historic", admin_level="2",
                     boundary="historic", iso3166="XH",
                     bbox=(140.00005, 10.00005, 150.00005, 20.00005), reason=None,
                     geom_wkb=wkb.rings_to_wkb([_rect(140.00005, 10.00005, 150.00005, 20.00005)])))
    rows.append(dict(layer="multipolygons", osm_id_raw=None, osm_way_id_raw="90006",
                     name="Wayland", name_en="Wayland", admin_level="2",
                     boundary="administrative", iso3166="XW",
                     bbox=(150.00005, 10.00005, 160.00005, 20.00005), reason=None,
                     geom_wkb=wkb.rings_to_wkb([_rect(150.00005, 10.00005, 160.00005, 20.00005)])))
    rows.append(dict(layer="multipolygons", osm_id_raw=None, osm_way_id_raw=None,
                     name="Nowhere", name_en="Nowhere", admin_level="2",
                     boundary="administrative", iso3166="XN",
                     bbox=(160.00005, 10.00005, 170.00005, 20.00005), reason=None,
                     geom_wkb=wkb.rings_to_wkb([_rect(160.00005, 10.00005, 170.00005, 20.00005)])))
    # decoys inside country 1 at a level no mapping selects
    rows.append(dict(layer="multipolygons", osm_id_raw="90007", osm_way_id_raw=None,
                     name="Decoy District", name_en="Decoy", admin_level="7",
                     boundary="administrative", iso3166=None,
                     bbox=(-169.0 + OFF, -69.0 + OFF, -168.0 + OFF, -68.0 + OFF),
                     reason=None,
                     geom_wkb=wkb.rings_to_wkb([_rect(-169.0 + OFF, -69.0 + OFF, -168.0 + OFF, -68.0 + OFF)])))
    # a nameless feature (M2: skipped with diagnostic)
    rows.append(dict(layer="multipolygons", osm_id_raw="90008", osm_way_id_raw=None,
                     name=None, name_en=None, admin_level="2",
                     boundary="administrative", iso3166=None,
                     bbox=(-179.0 + OFF, 70.0 + OFF, -178.0 + OFF, 71.0 + OFF),
                     reason=None,
                     geom_wkb=wkb.rings_to_wkb([_rect(-179.0 + OFF, 70.0 + OFF, -178.0 + OFF, 71.0 + OFF)])))
    return rows


def raw_boundaries() -> pa.Table:
    """Pre-extraction boundary features, layer-tagged like the OSM reader
    output (exposm/reader.py:37-73): columns
    (layer, osm_id_raw, osm_way_id_raw, name, name_en, admin_level:string,
    boundary, iso3166, geom_wkb). Deterministic mutations of the clean set::

      - id prefixes expected per M1: multipolygons->R (or W if only way id)
      - every 7th state/county row loses name_en (M2 coalesce)
      - country isos arrive lowercase (M3 upper)
      - appended rows: bowtie (Self-intersection), tiny ring (Too few
        points), unparseable WKB (BONKERS!), maritime + historic tag rows,
        a way-only multipolygon, a row with no id at all, and decoy rows at
        admin_level '7' (dropped by the M6 mapping predicate)
    """
    rows = _raw_rows()
    cols = ["layer", "osm_id_raw", "osm_way_id_raw", "name", "name_en",
            "admin_level", "boundary", "iso3166", "geom_wkb"]
    arrays = {c: pa.array([r[c] for r in rows],
                          pa.binary() if c == "geom_wkb" else pa.string())
              for c in cols}
    return pa.table(arrays)


def _sqlq(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    return "'" + str(v).replace("'", "''") + "'"


def raw_values_sql() -> str:
    """DuckDB VALUES clause for the raw fixture's non-geometric attributes:
    (layer, osm_id_raw, osm_way_id_raw, name, name_en, admin_level,
    boundary, iso3166, reason, plon, plat, cx, cy, minx, miny, maxx, maxy).
    ``reason``/``plon``/``plat`` are the fixture-design validity outcomes
    (see _raw_rows); ``cx``/``cy`` the bbox center (the representative
    point of an axis-aligned rectangle — NULL for invalid geometries)."""
    vals = []
    for r in _raw_rows():
        bbox = r["bbox"] if r["bbox"] is not None else (None,) * 4
        if r["bbox"] is not None:
            cx = (r["bbox"][0] + r["bbox"][2]) / 2.0
            cy = (r["bbox"][1] + r["bbox"][3]) / 2.0
        else:
            cx = cy = None
        vals.append("({})".format(", ".join(_sqlq(v) for v in (
            r["layer"], r["osm_id_raw"], r["osm_way_id_raw"], r["name"],
            r["name_en"], r["admin_level"], r["boundary"], r["iso3166"],
            r["reason"], r.get("plon"), r.get("plat"), cx, cy, *bbox))))
    return ", ".join(vals)


_RAW_NORM_SQL = """
  SELECT *,
    CASE layer
      WHEN 'points' THEN 'N' || osm_id_raw
      WHEN 'lines' THEN 'W' || osm_id_raw
      WHEN 'multipolygons' THEN
        CASE WHEN osm_id_raw IS NOT NULL AND osm_way_id_raw IS NULL
               THEN 'R' || osm_id_raw
             WHEN osm_way_id_raw IS NOT NULL AND osm_id_raw IS NULL
               THEN 'W' || osm_way_id_raw END
      WHEN 'multilinestrings' THEN 'R' || osm_id_raw
      WHEN 'other_relations' THEN 'R' || osm_id_raw END AS prep_id,
    COALESCE(name_en, name) AS nm_en,
    UPPER(iso3166) AS iso_u
  FROM (SELECT * FROM (VALUES {values}) AS t(
    layer, osm_id_raw, osm_way_id_raw, name, name_en, admin_level,
    boundary, iso3166, reason, plon, plat, cx, cy, minx, miny, maxx, maxy))
"""


def raw_norm_sql() -> str:
    """The normalize stage (M1-M3) as SQL over the inlined raw fixture."""
    return _RAW_NORM_SQL.format(values=raw_values_sql())


def mapping_case_sql(level: int, country_expr: str) -> str:
    """The per-country admin-level mapping (M6, admin_mapping.yaml
    analogue) as a SQL CASE over the containing-country id."""
    key = f"admin_level_{level}"
    whens = " ".join(
        f"WHEN {country_expr} = '{c}' THEN '{m[key]}'"
        for c, m in sorted(ADMIN_MAPPING_OVERRIDES.items()) if key in m)
    return f"CASE {whens} ELSE '{ADMIN_MAPPING_DEFAULT[key]}' END"


# ---------------------------------------------------------------------------
# GADM-shaped fixture (levels 0-3) — extract_gadm.py input analogue
# ---------------------------------------------------------------------------

def _gadm_rows() -> list[dict]:
    """GADM archive analogue: one 'file' per admin level 0-3 with
    (pcode, name_en, bbox). Level 3 quarters each county (inset 0.5)."""
    rows = []
    for k, cname, iso, cx, cy in _COUNTRIES:
        cbox = (cx, cy, cx + COUNTRY_SIZE, cy + COUNTRY_SIZE)
        rows.append(dict(level=0, pcode=iso, name_en=cname, bbox=cbox))
        for s, sbox in enumerate(_quarters(*cbox, STATE_INSET)):
            rows.append(dict(level=1, pcode=f"{iso}.{s}",
                             name_en=f"{cname}-S{s}", bbox=sbox))
            for c, dbox in enumerate(_quarters(*sbox, COUNTY_INSET)):
                rows.append(dict(level=2, pcode=f"{iso}.{s}.{c}",
                                 name_en=f"{cname}-S{s}-C{c}", bbox=dbox))
                for d, ebox in enumerate(_quarters(*dbox, 0.5)):
                    rows.append(dict(level=3, pcode=f"{iso}.{s}.{c}.{d}",
                                     name_en=f"{cname}-S{s}-C{c}-D{d}",
                                     bbox=ebox))
    return rows


def gadm_tables() -> dict[int, pa.Table]:
    """Per-level GADM-shaped tables (ADMx_PCODE, ADMx_EN, geom_wkb) — the
    extractGADMArchive(filepath) output analogue (extract_gadm.py:32-40)."""
    from ..geom import wkb as _wkb

    out = {}
    for lvl in range(4):
        rows = [r for r in _gadm_rows() if r["level"] == lvl]
        out[lvl] = pa.table({
            "pcode": pa.array([r["pcode"] for r in rows], pa.string()),
            "name_en": pa.array([r["name_en"] for r in rows], pa.string()),
            "geom_wkb": pa.array(
                [_wkb.rings_to_wkb([_rect(*r["bbox"])]) for r in rows],
                pa.binary()),
        })
    return out


def gadm_values_sql(level: int) -> str:
    """(pcode, minx, miny, maxx, maxy) VALUES rows for the oracle SQL.
    Coords cast to DOUBLE — bare decimal literals parse as DECIMAL and
    overflow in DuckDB's bbox-center arithmetic."""
    rows = [r for r in _gadm_rows() if r["level"] == level]
    return ", ".join(
        "('%s', CAST(%r AS DOUBLE), CAST(%r AS DOUBLE), CAST(%r AS DOUBLE),"
        " CAST(%r AS DOUBLE))" % (r["pcode"], *r["bbox"]) for r in rows)
