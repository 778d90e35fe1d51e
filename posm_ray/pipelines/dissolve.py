"""Deconstruct / dissolve / simplify — the PostGIS proc layer rebuilt.

Reference: ``postgis_sql/proc_functions.sql`` —
- ``deconstruct_geometry`` (:86-200, A2): bottom-up per-parent
  difference(parent, union(children)); empty -> children cover parent;
  NULL -> childless parent inserted directly; else -> synthetic
  ``'xxx'||n`` hole-filler row + children. Output table ``all_geom``
  (osm_id, is_in_state, is_in_country, adminlevel, geom).
- ``simplify_dissolve`` (:203-333, A6+A1): ST_Simplify every all_geom row
  (Douglas-Peucker, default tolerance manage.py:116-121), then build
  ``simple_admin_{0..2}`` via filters and union-by-parent GROUP BYs.
- ancestry views (:337-362, J4): attribute joins reconstructing each row's
  (is_in_country, is_in_state).

Geometry model: even-odd ring lists (posm_ray.geom.kernels). The
difference(parent, union(children)) for a hierarchy whose children are
disjoint and inside their parent (guaranteed by the PIP acceptance
semantics) is exactly the ring list [parent_rings + children_rings] under
the even-odd rule — no general polygon clipper needed; coverage is decided
by area accounting. Union-by-parent uses the deconstruct invariant
(union(children + filler) == parent) and falls back to ring concatenation
for disjoint members (the NULL-parent branches).

This is the 3-level instance of the reference's 4-level procedure (posm's
extract.py builds levels 0-2; the SQL's admin_level_3 loop applies when a
GADM-style level 3 exists).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom import kernels, wkb

ALL_GEOM_SCHEMA = pa.schema([
    ("osm_id", pa.string()),
    ("is_in_state", pa.string()),
    ("is_in_country", pa.string()),
    ("adminlevel", pa.int32()),
    ("geom_wkb", pa.binary()),
])


def _rows_by_parent(table: pa.Table) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = {}
    for r in table.to_pylist():
        out.setdefault(r["is_in"], []).append(r)
    return out


def _area(rings: list[np.ndarray]) -> float:
    return sum(abs(kernels.ring_area(r)) for r in rings)


def deconstruct_geometry(levels: dict[int, pa.Table],
                         fill_holes: bool = True) -> pa.Table:
    """A2 rebuild (proc_functions.sql:86-200). ``levels`` = accepted
    hierarchy tables (0..2, writer schema). Parents processed in
    ORDER BY osm_id ASC per level, bottom-up (level 1 loop, then level 0),
    matching the SQL's loop order; the global ``tmp_id`` counter for the
    synthetic 'xxx' rows follows that order exactly."""
    rows: list[dict] = []
    tmp_id = 0
    l2_by_parent = _rows_by_parent(levels[2])
    l1_by_parent = _rows_by_parent(levels[1])

    def add(osm_id, state, country, lvl, geom_wkb):
        rows.append(dict(osm_id=osm_id, is_in_state=state,
                         is_in_country=country, adminlevel=lvl,
                         geom_wkb=geom_wkb))

    # level-1 parents (states), children = level-2 (sql:139-173 shape)
    for parent in sorted(levels[1].to_pylist(), key=lambda r: r["osm_id"]):
        children = l2_by_parent.get(parent["osm_id"], [])
        p_rings = wkb.wkb_to_rings(parent["geom_wkb"])
        if not children:
            # t_geom NULL branch: insert the parent itself, is_in_state NULL
            add(parent["osm_id"], None, parent["is_in"],
                parent["adminlevel"], parent["geom_wkb"])
            continue
        c_rings = [ring for c in children
                   for ring in wkb.wkb_to_rings(c["geom_wkb"])]
        covered = abs(_area(p_rings) - _area(c_rings)) < 1e-12
        if not covered and fill_holes:
            # difference = even-odd [parent + children] (module docstring)
            add(f"xxx{tmp_id}", parent["osm_id"], parent["is_in"],
                parent["adminlevel"], wkb.rings_to_wkb(p_rings + c_rings))
            tmp_id += 1
        for c in children:
            add(c["osm_id"], c["is_in"], parent["is_in"],
                c["adminlevel"], c["geom_wkb"])

    # level-0 parents (countries), children = level-1 (sql:171-197: only
    # the filler/self rows are inserted — the state rows are commented out)
    for parent in sorted(levels[0].to_pylist(), key=lambda r: r["osm_id"]):
        states = l1_by_parent.get(parent["osm_id"], [])
        p_rings = wkb.wkb_to_rings(parent["geom_wkb"])
        if not states:
            add(parent["osm_id"], None, None,
                parent["adminlevel"], parent["geom_wkb"])
            continue
        s_rings = [ring for s in states
                   for ring in wkb.wkb_to_rings(s["geom_wkb"])]
        covered = abs(_area(p_rings) - _area(s_rings)) < 1e-12
        if not covered and fill_holes:
            add(f"xxx{tmp_id}", None, parent["osm_id"],
                parent["adminlevel"], wkb.rings_to_wkb(p_rings + s_rings))
            tmp_id += 1

    return pa.table({
        f.name: pa.array([r[f.name] for r in rows], f.type)
        for f in ALL_GEOM_SCHEMA
    })


# ---------------------------------------------------------------------------
# simplify + dissolve (Ray-native: map_batches simplify, groupby dissolve)
# ---------------------------------------------------------------------------

def simplify_table(all_geom, tolerance: float = 0.001):
    """ST_Simplify analogue over all_geom as a Dataset map_batches stage
    (per-row Douglas-Peucker; embarrassingly parallel)."""
    import ray.data as rd

    ds = rd.from_arrow(all_geom) if isinstance(all_geom, pa.Table) else all_geom

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch["geom_wkb"]:
            rings = wkb.wkb_to_rings(b.as_py())
            out.append(wkb.rings_to_wkb(kernels.simplify_rings(rings, tolerance)))
        return batch.set_column(batch.schema.get_field_index("geom_wkb"),
                                "geom_wkb", pa.array(out, pa.binary()))

    return ds.map_batches(fn, batch_format="pyarrow")


def simplify_dissolve(levels: dict[int, pa.Table], all_geom: pa.Table,
                      tolerance: float = 0.001) -> dict[int, pa.Table]:
    """A6+A1 rebuild (proc_functions.sql:203-333): returns
    {2: simple_admin_2, 1: simple_admin_1, 0: simple_admin_0} with columns
    (osm_id, geom_wkb).

    Union-by-parent groups resolve to the parent's (simplified) geometry —
    the deconstruct invariant; NULL-parent branches pass members through
    (q2 legs of the SQL)."""
    simple_all = pa.concat_tables(
        list(simplify_table(all_geom, tolerance)
             .iter_batches(batch_format="pyarrow")))
    sa = simple_all.to_pylist()
    parent_geom: dict[str, bytes] = {}
    for lvl in (0, 1):
        for r in levels[lvl].to_pylist():
            parent_geom[r["osm_id"]] = r["geom_wkb"]

    def simp(geom: bytes) -> bytes:
        return wkb.rings_to_wkb(
            kernels.simplify_rings(wkb.wkb_to_rings(geom), tolerance))

    # simple_admin_2: is_in_state not null, not 'xxx' (sql:263-270)
    s2 = [(r["osm_id"], r["geom_wkb"]) for r in sa
          if r["is_in_state"] is not None and not r["osm_id"].startswith("xxx")]

    # simple_admin_1: group by is_in_state (not null) -> union == state;
    # UNION rows with is_in_state null, not 'xxx', by osm_id (sql:284-306)
    states = sorted({r["is_in_state"] for r in sa
                     if r["is_in_state"] is not None})
    s1 = [(s, simp(parent_geom[s])) for s in states if s in parent_geom]
    s1 += [(r["osm_id"], r["geom_wkb"]) for r in sa
           if r["is_in_state"] is None and not r["osm_id"].startswith("xxx")]

    # simple_admin_0: group ALL rows by is_in_country -> union == country
    # (NULL key group keeps a NULL-osm_id row, faithful to the SQL GROUP BY);
    # UNION rows with both parents null, not 'xxx' (sql:311-332)
    countries = sorted({r["is_in_country"] for r in sa
                        if r["is_in_country"] is not None})
    s0 = [(c, simp(parent_geom[c])) for c in countries if c in parent_geom]
    null_group = [r for r in sa if r["is_in_country"] is None]
    if null_group:
        rings = [ring for r in null_group
                 for ring in wkb.wkb_to_rings(r["geom_wkb"])]
        s0.append((None, wkb.rings_to_wkb(rings)))
    s0 += [(r["osm_id"], r["geom_wkb"]) for r in sa
           if r["is_in_country"] is None and r["is_in_state"] is None
           and not r["osm_id"].startswith("xxx")]

    def tab(pairs):
        return pa.table({
            "osm_id": pa.array([p[0] for p in pairs], pa.string()),
            "geom_wkb": pa.array([p[1] for p in pairs], pa.binary()),
        })

    return {2: tab(s2), 1: tab(s1), 0: tab(s0)}


# ---------------------------------------------------------------------------
# ancestry views (J4, proc_functions.sql:337-362)
# ---------------------------------------------------------------------------

def simple_admin_view(levels: dict[int, pa.Table],
                      simple: dict[int, pa.Table], k: int) -> pa.Table:
    """simple_admin_{k}_view: inner joins up the is_in chain; exposes both
    the simplified and the natural geometry."""
    adk = levels[k].to_pandas()
    sak = simple[k].to_pandas().rename(columns={"geom_wkb": "wkb_geometry"})
    if k == 0:
        v = adk.merge(sak, on="osm_id", how="inner")
        v = v.rename(columns={"geom_wkb": "natural_wkb_geometry"})
        return pa.Table.from_pandas(
            v[["osm_id", "name", "name_en", "iso3166", "wkb_geometry",
               "natural_wkb_geometry"]], preserve_index=False)
    ad1 = levels[1].to_pandas()[["osm_id", "is_in"]]
    if k == 1:
        v = adk.merge(sak, on="osm_id", how="inner")
        v = v.rename(columns={"is_in": "is_in_country",
                              "geom_wkb": "natural_wkb_geometry"})
        return pa.Table.from_pandas(
            v[["osm_id", "name", "name_en", "wkb_geometry", "is_in_country",
               "natural_wkb_geometry"]], preserve_index=False)
    # k == 2: country <- state <- county chain
    v = adk.merge(sak, on="osm_id", how="inner")
    v = v.rename(columns={"is_in": "is_in_state",
                          "geom_wkb": "natural_wkb_geometry"})
    v = v.merge(ad1.rename(columns={"osm_id": "is_in_state",
                                    "is_in": "is_in_country"}),
                on="is_in_state", how="inner")
    return pa.Table.from_pandas(
        v[["osm_id", "name", "name_en", "wkb_geometry", "is_in_country",
           "is_in_state", "natural_wkb_geometry"]], preserve_index=False)


def ancestry(levels: dict[int, pa.Table]) -> pa.Table:
    """Attribute-only ancestry join (the view minus geometry): level-2 rows
    with (osm_id, name_en, is_in_state, is_in_country) — DuckDB-checkable."""
    ad2 = levels[2].to_pandas()[["osm_id", "name_en", "is_in"]]
    ad1 = levels[1].to_pandas()[["osm_id", "is_in"]]
    v = ad2.rename(columns={"is_in": "is_in_state"}).merge(
        ad1.rename(columns={"osm_id": "is_in_state", "is_in": "is_in_country"}),
        on="is_in_state", how="inner")
    return pa.Table.from_pandas(
        v[["osm_id", "name_en", "is_in_state", "is_in_country"]],
        preserve_index=False)
