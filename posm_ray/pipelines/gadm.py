"""GADM 4-level hierarchy extraction (extract_gadm.py rebuilt, levels 0-3).

Reference lifecycle (extract_gadm.py:44-314): one pass per admin level over
the GADM shapefile set; per feature — pcode id suffixing ``'{}0'.format``
(:74), ForceToMultiPolygon (:78), unusable blocklist (:266-272),
representative point (:280), PIP probes against ALL previously accepted
level indexes (:282-286), keyed on the IMMEDIATE parent (drop if none,
:288-292), writer-schema output + per-level rtree/prepared state
(:303-306).

Ray mapping: levels are sequential stage barriers (each accepted level is
the broadcast small side of the next pass); within a level the features
flow as one Arrow-table pass of vectorized probes against GridIndexes —
the boundary tables are small-side by design (pages are the big side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import wkb
from ..geom.index import GridIndex
from ..geom.kernels import representative_point

OUT_SCHEMA = pa.schema([
    ("osm_id", pa.string()),
    ("name", pa.string()),
    ("name_en", pa.string()),
    ("adminlevel", pa.int32()),
    ("iso3166", pa.string()),
    ("is_in", pa.string()),
    ("geom_wkb", pa.binary()),
])


def gadm_osm_id(pcode: str) -> str:
    """``'{}0'.format(pcode)`` — extract_gadm.py:74 id suffixing."""
    return f"{pcode}0"


def _index_of(table: pa.Table) -> GridIndex:
    ids = table["osm_id"].to_pylist()
    rings = [wkb.wkb_to_rings(b.as_py()) for b in table["geom_wkb"]]
    return GridIndex(ids, rings)


def extract_gadm_hierarchy(tables: dict[int, pa.Table],
                           unusable: frozenset[str] = frozenset()
                           ) -> dict[int, pa.Table]:
    """``tables``: per-level GADM-shaped inputs (pcode, name_en, geom_wkb).
    Returns per-level writer-schema tables; each level-k feature is kept iff
    its representative point falls in an accepted level-(k-1) parent
    (level 0 is unconditional), matching the reference's drop-if-no-parent
    passes. Fewer than 4 input levels is fine (extract_gadm.py:259-261
    skips absent files)."""
    out: dict[int, pa.Table] = {}
    indexes: dict[int, GridIndex] = {}

    for lvl in sorted(tables):
        src = tables[lvl]
        rows = {k: [] for k in OUT_SCHEMA.names}
        for r in src.to_pylist():
            osm_id = gadm_osm_id(r["pcode"])
            if osm_id in unusable:
                continue  # :266-272
            rings = wkb.wkb_to_rings(r["geom_wkb"])
            if lvl == 0:
                parent = None
            else:
                px, py = representative_point(rings)
                hit = indexes[lvl - 1].query_points(
                    np.array([py]), np.array([px]))[0]
                if not hit:
                    continue  # missing parent -> skip (:288-292)
                parent = hit
            rows["osm_id"].append(osm_id)
            rows["name"].append(r["name_en"])
            rows["name_en"].append(r["name_en"])
            rows["adminlevel"].append(lvl)
            rows["iso3166"].append(r["pcode"] if lvl == 0 else None)
            rows["is_in"].append(parent)
            rows["geom_wkb"].append(r["geom_wkb"])
        out[lvl] = pa.table({f.name: pa.array(rows[f.name], f.type)
                             for f in OUT_SCHEMA})
        indexes[lvl] = _index_of(out[lvl])
    return out
