"""Boundary-extraction pipeline — posm's flagship extract rebuilt Ray-Data-first.

Reference lifecycle (extract.py:64-358, SURVEY.md §3.1): three sequential
full scans of the OSM input, each building per-level PostGIS tables plus
in-process rtree/prepared-dict state. Rebuild: ONE normalize pass over the
raw feature Dataset (M1 id prefixing, M2 name coalesce, M3 iso upper,
M4 validity gate + reason, M5 admin-tag check, M8 representative point —
all per-batch), then per-level acceptance with a **stage barrier** between
levels (the accepted level-k table is materialized — it is the small side —
and broadcast into the level-k+1 PIP stage, SURVEY.md §2.10 ordering note).

Faithful reference semantics:
- pass 0 keeps ``admin_level == '2'`` rows (extract.py:141-162); the saved
  ``name`` column receives name_en (extract.py:146-147);
- pass 1 keeps rows whose representative point lands in a country and whose
  ``admin_level`` equals the per-country mapping's admin_level_1
  (extract.py:211-265); ``is_in`` = country;
- pass 2 probes country AND state; keeps rows matching admin_level_2 for the
  country, with a state parent; ``is_in`` = state (extract.py:296-355);
- unusable set = bad-geometry + non-administrative rows, skipped in later
  passes (extract.py:73,122,135,201,296);
- problems sink (osm_id, reason, link) per writeProblem/genProblemLink
  (exposm/utils.py:105-153);
- discards sink per extract_all.py:55-81 (non-BONKERS bad geometry with the
  RAW osm_id + missing-id rows);
- check-file diffs per read/write_admin_check_files (extract.py:27-61).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import ids as idfn
from ..geom import kernels, wkb
from ..geom.index import GridIndex
from ..sources import boundaries as bsrc
from ..util import default_pool

LEVEL0_ADMIN_LEVEL = "2"  # extract.py:141 — countries are admin_level '2'


# ---------------------------------------------------------------------------
# problem link / reason parsing (faithful to exposm/utils.py:105-126)
# ---------------------------------------------------------------------------

def parse_reason(reason: str) -> tuple[float, float]:
    """Reference parseReason (exposm/utils.py:105-115): only the
    self-intersection/duplicate-ring grammars carry coordinates; BONKERS
    maps to (0,0); anything else to (-1000,-1000)."""
    if reason.startswith("Ring Self-intersection"):
        parts = reason[23:-1].split(" ")
    elif reason.startswith("Self-intersection"):
        parts = reason[18:-1].split(" ")
    elif reason.startswith("Duplicate Rings"):
        parts = reason[16:-1].split(" ")
    elif reason.startswith("BONKERS!"):
        return (0.0, 0.0)
    else:
        return (-1000.0, -1000.0)
    return (float(parts[0]), float(parts[1]))


def gen_problem_link(osm_id: str | None) -> str:
    """Reference genProblemLink (exposm/utils.py:118-126)."""
    if not osm_id:
        return f"Unknown feature type for osm_id: {osm_id}"
    if osm_id[0] == "N":
        return f"http://www.openstreetmap.org/node/{osm_id[1:]}"
    if osm_id[0] == "W":
        return f"http://www.openstreetmap.org/way/{osm_id[1:]}"
    if osm_id[0] == "R":
        return f"http://www.openstreetmap.org/relation/{osm_id[1:]}"
    return f"Unknown feature type for osm_id: {osm_id}"


def problem_link(osm_id: str | None, reason: str) -> str:
    """writeProblem's link assembly (exposm/utils.py:129-153): coords from
    the reason string; (0,0) (BONKERS) gets the bare link."""
    lon, lat = parse_reason(reason)
    link = gen_problem_link(osm_id)
    if (lon, lat) != (0.0, 0.0):
        link = f"{link}?mlat={lat}&mlon={lon}#map=18/{lat}/{lon}"
    return link


# ---------------------------------------------------------------------------
# normalize stage (one pass: M1-M5 + M8)
# ---------------------------------------------------------------------------

def normalize_batch(batch: pa.Table) -> pa.Table:
    """Raw feature batch -> normalized batch with derived columns:
    osm_id (prefixed, null=discard), name_en (coalesced), iso3166 (upper),
    reason (null=valid geometry), rep_lat/rep_lon (representative point,
    NaN when geometry is bad)."""
    osm_id = idfn.prepare_osm_id(batch["layer"], batch["osm_id_raw"],
                                 batch["osm_way_id_raw"])
    name_en = pc.coalesce(batch["name_en"], batch["name"])
    iso = pc.utf8_upper(batch["iso3166"])
    reasons: list[str | None] = []
    rlat = np.full(batch.num_rows, np.nan)
    rlon = np.full(batch.num_rows, np.nan)
    for i, b in enumerate(batch["geom_wkb"]):
        raw = b.as_py()
        if raw is None:
            reasons.append(kernels.BONKERS)
            continue
        try:
            rings = wkb.wkb_to_rings(raw)
        except (ValueError, struct_error):
            reasons.append(kernels.BONKERS)
            continue
        reason = kernels.explain_validity(rings)
        reasons.append(reason)
        if reason is None:
            x, y = kernels.representative_point(rings)
            rlon[i], rlat[i] = x, y
    return pa.table({
        "osm_id": osm_id,
        "osm_id_raw": batch["osm_id_raw"],
        "name": batch["name"],
        "name_en": name_en,
        "admin_level": batch["admin_level"],
        "boundary": batch["boundary"],
        "iso3166": iso,
        "geom_wkb": batch["geom_wkb"],
        "reason": pa.array(reasons, pa.string()),
        "rep_lat": pa.array(rlat),
        "rep_lon": pa.array(rlon),
    })


import struct

struct_error = struct.error


def normalized(raw, *, batch_size: int = 1024):
    """Raw Dataset/Table -> normalized Dataset (single map_batches pass)."""
    import ray.data as rd

    ds = rd.from_arrow(raw) if isinstance(raw, pa.Table) else raw
    return ds.map_batches(normalize_batch, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# sinks derived from the normalized Dataset
# ---------------------------------------------------------------------------

def problems_table(norm) -> pa.Table:
    """(osm_id, reason, link, lon, lat) — rows that passed the id+name gates
    but failed the validity gate (extract.py:118-126 + utils.py:129-153).
    The Point geometry is the parsed problem location."""

    def mask(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b["osm_id"]),
                            pc.is_valid(b["name_en"])),
                    pc.is_valid(b["reason"]))
        return b.filter(m)

    flt = norm.map_batches(mask, batch_format="pyarrow")
    out = {"osm_id": [], "reason": [], "link": [], "lon": [], "lat": []}
    for b in flt.iter_batches(batch_format="pyarrow"):
        for osm_id, reason in zip(b["osm_id"].to_pylist(),
                                  b["reason"].to_pylist()):
            lon, lat = parse_reason(reason)
            out["osm_id"].append(osm_id)
            out["reason"].append(reason)
            out["link"].append(problem_link(osm_id, reason))
            out["lon"].append(lon)
            out["lat"].append(lat)
    return pa.table({
        "osm_id": pa.array(out["osm_id"], pa.string()),
        "reason": pa.array(out["reason"], pa.string()),
        "link": pa.array(out["link"], pa.string()),
        "lon": pa.array(out["lon"], pa.float64()),
        "lat": pa.array(out["lat"], pa.float64()),
    })


def discards_table(norm) -> pa.Table:
    """(osm_id, name, adminlevel, reason) per extract_all.py:55-81:
    non-BONKERS bad geometry keeps the RAW osm_id; features whose prepared
    id is null are discarded with 'Feature without OSM_ID!'."""

    def fn(batch: pa.Table) -> pa.Table:
        reason = batch["reason"].to_pylist()
        raw_id = batch["osm_id_raw"].to_pylist()
        prep_id = batch["osm_id"].to_pylist()
        name = batch["name"].to_pylist()
        lvl = batch["admin_level"].to_pylist()
        o_id, o_name, o_lvl, o_reason = [], [], [], []
        for i in range(batch.num_rows):
            if reason[i] is not None and reason[i] != kernels.BONKERS:
                o_id.append(raw_id[i])
                o_name.append(name[i])
                o_lvl.append(lvl[i])
                o_reason.append(reason[i])
            elif reason[i] is None and prep_id[i] is None:
                o_id.append(None)
                o_name.append(name[i])
                o_lvl.append(lvl[i])
                o_reason.append("Feature without OSM_ID!")
        return pa.table({
            "osm_id": pa.array(o_id, pa.string()),
            "name": pa.array(o_name, pa.string()),
            "adminlevel": pa.array(o_lvl, pa.string()),
            "reason": pa.array(o_reason, pa.string()),
        })

    tables = list(norm.map_batches(fn, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tables) if tables else fn(
        pa.table({c: pa.array([], pa.string()) for c in
                  ("reason", "osm_id_raw", "osm_id", "name", "admin_level")}))


def unusable_ids(norm) -> frozenset[str]:
    """Blocklist (extract.py:73,122,135): ids with bad geometry or a
    non-administrative boundary tag. Small set — collected to the driver
    and broadcast (X4 analogue)."""
    def mask(b: pa.Table) -> pa.Table:
        non_admin = pc.fill_null(
            pc.not_equal(b["boundary"], "administrative"), True)
        m = pc.and_(pc.is_valid(b["osm_id"]),
                    pc.or_(pc.is_valid(b["reason"]), non_admin))
        return b.filter(m)

    flt = norm.map_batches(mask, batch_format="pyarrow") \
        .select_columns(["osm_id"])
    out: set[str] = set()
    for b in flt.iter_batches(batch_format="pyarrow"):
        out.update(b["osm_id"].to_pylist())
    return frozenset(out)


# ---------------------------------------------------------------------------
# per-level acceptance passes
# ---------------------------------------------------------------------------

_ACCEPT_SCHEMA = pa.schema([
    ("osm_id", pa.string()),
    ("name", pa.string()),
    ("name_en", pa.string()),
    ("adminlevel", pa.int32()),
    ("iso3166", pa.string()),
    ("is_in", pa.string()),
    ("geom_wkb", pa.binary()),
])


def _accept_table(rows: dict) -> pa.Table:
    return pa.table({k: pa.array(rows[k], _ACCEPT_SCHEMA.field(k).type)
                     for k in _ACCEPT_SCHEMA.names})


def accept_level0(norm) -> pa.Table:
    """Pass 0 (extract.py:92-162): valid, administrative, admin_level=='2';
    saved name = name_en; is_in = NULL. Fully vectorized (Arrow mask +
    column projection — no per-row python)."""

    def accept(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b["osm_id"]),
                            pc.is_valid(b["name_en"])),
                    pc.is_null(b["reason"]))
        m = pc.and_(m, pc.fill_null(
            pc.equal(b["boundary"], "administrative"), False))
        m = pc.and_(m, pc.fill_null(
            pc.equal(b["admin_level"], LEVEL0_ADMIN_LEVEL), False))
        b = b.filter(m)
        return pa.table({
            "osm_id": b["osm_id"],
            "name": b["name_en"],   # extract.py:146 name<-name_en
            "name_en": b["name_en"],
            "adminlevel": pc.cast(b["admin_level"], pa.int32()),
            "iso3166": b["iso3166"],
            "is_in": pa.nulls(b.num_rows, pa.string()),
            "geom_wkb": b["geom_wkb"],
        })

    tables = list(norm.map_batches(accept, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow"))
    tables = [t for t in tables if t.num_rows]
    return (pa.concat_tables(tables).combine_chunks() if tables
            else _accept_table({k: [] for k in _ACCEPT_SCHEMA.names}))


class _HierarchyPass:
    """Actor stage for passes 1/2: probes the broadcast parent-level
    table(s), applies the per-country admin-level mapping predicate
    (extract.py:218-247, M6), and emits accepted rows in writer schema.

    ``level`` is 1 or 2; ``refs`` is (level0_ref,) or (level0_ref,
    level1_ref) — ray.put ObjectRefs (or plain tables in tests)."""

    def __init__(self, level: int, refs, blocklist, mapping_default,
                 mapping_overrides):
        self.level = level
        tables = []
        for ref in refs:
            t = ref
            if not isinstance(t, pa.Table):
                import ray

                t = ray.get(ref)
            tables.append(t)
        self.idx0 = self._build(tables[0])
        self.idx1 = self._build(tables[1]) if level == 2 else None
        bl = blocklist
        if not isinstance(bl, frozenset):
            import ray

            bl = ray.get(blocklist)
        self.blocklist = np.array(sorted(bl), dtype=object)
        self.mapping_default = mapping_default
        self.mapping_overrides = mapping_overrides
        self._search_cache: dict[str, str | None] = {}

    @staticmethod
    def _build(table: pa.Table) -> GridIndex:
        ids_ = table["osm_id"].to_pylist()
        rings = [wkb.wkb_to_rings(b.as_py()) for b in table["geom_wkb"]]
        return GridIndex(ids_, rings)

    def _search_level(self, country: str) -> str | None:
        key = f"admin_level_{self.level}"
        override = self.mapping_overrides.get(country, {}).get(key)
        return override if override else self.mapping_default.get(key)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized acceptance — all gates are numpy/Arrow masks
        (gate semantics match extract.py:180-206 / 274-301; the former
        per-row python loop was the repo's own anti-pattern #7)."""
        rep_lat = batch["rep_lat"].to_numpy(zero_copy_only=False)
        rep_lon = batch["rep_lon"].to_numpy(zero_copy_only=False)
        finite = np.isfinite(rep_lat) & np.isfinite(rep_lon)
        qlat = np.where(finite, rep_lat, 0.0)
        qlon = np.where(finite, rep_lon, 0.0)
        osm_id = np.asarray(batch["osm_id"].to_pylist(), dtype=object)
        has_id = np.array([v is not None for v in osm_id], dtype=bool)
        has_name = pc.is_valid(batch["name_en"]).to_numpy(zero_copy_only=False)
        blocked = np.isin(osm_id, self.blocklist)
        base = has_id & has_name & ~blocked & finite

        in_country = self.idx0.query_points(qlat, qlon)
        country_ok = base & (in_country != "")
        # per-country mapping predicate, vectorized over unique countries
        search = np.full(len(osm_id), None, dtype=object)
        for c in set(in_country[country_ok]):
            if c not in self._search_cache:
                self._search_cache[c] = self._search_level(c)
            search[in_country == c] = self._search_cache[c]
        admin_level = np.asarray(batch["admin_level"].to_pylist(), dtype=object)
        level_ok = np.array(
            [s is not None and a == str(s)
             for s, a in zip(search, admin_level)], dtype=bool)
        mask = country_ok & level_ok
        if self.level == 2:
            in_state = self.idx1.query_points(qlat, qlon)
            mask &= in_state != ""  # extract.py:334-338 drop-if-no-state
            parent = in_state
        else:
            parent = in_country
        b = batch.filter(pa.array(mask))
        par = pa.array([p for p, m in zip(parent, mask) if m], pa.string())
        return pa.table({
            "osm_id": b["osm_id"],
            "name": b["name_en"],
            "name_en": b["name_en"],
            "adminlevel": pc.cast(b["admin_level"], pa.int32()),
            "iso3166": pa.nulls(b.num_rows, pa.string()),
            "is_in": par,
            "geom_wkb": b["geom_wkb"],
        })


def accept_hierarchy_level(norm, level: int, parent_tables: list[pa.Table],
                           blocklist: frozenset[str], *,
                           mapping_default: dict | None = None,
                           mapping_overrides: dict | None = None,
                           concurrency=None) -> pa.Table:
    """Run pass 1 or 2 as an actor-pool map_batches over the normalized
    Dataset, parent tables broadcast via ray.put."""
    import ray

    refs = [ray.put(t) for t in parent_tables]
    bl_ref = ray.put(blocklist)
    md = mapping_default if mapping_default is not None else bsrc.ADMIN_MAPPING_DEFAULT
    mo = mapping_overrides if mapping_overrides is not None else bsrc.ADMIN_MAPPING_OVERRIDES
    ds = norm.map_batches(
        _HierarchyPass,
        batch_format="pyarrow",
        batch_size=1024,
        zero_copy_batch=True,
        fn_constructor_kwargs=dict(level=level, refs=refs, blocklist=bl_ref,
                                   mapping_default=md, mapping_overrides=mo),
        concurrency=(concurrency if concurrency is not None
                     else default_pool()),
    )
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    tables = [t for t in tables if t.num_rows]
    return (pa.concat_tables(tables) if tables
            else _accept_table({k: [] for k in _ACCEPT_SCHEMA.names}))


def drill_down(join_rows_ds, boundaries: pa.Table, osm_id: str):
    """J6 ``for_osm_id`` drill-down (django_project/demo/models.py:11-39):
    resolve ``osm_id``'s admin level in the (small, broadcast) hierarchy —
    a level-0 node semi-joins the metrics table against its level-1
    children (``is_in_country``), a level-1 node against its level-2
    children (``is_in_state``), anything else returns empty. The metrics
    table analogue is the flagship join-rows Dataset (one row per
    geocoded page); output is the per-child doc rollup.

    Shape: children id set is broadcast into a vectorized Arrow mask over
    the streaming big side (the reference's ``object_id__in`` filter); ONE
    tiny hash exchange merges the per-batch partial counts."""
    from ..util import hash_rollup

    levels = dict(zip(boundaries["osm_id"].to_pylist(),
                      boundaries["adminlevel"].to_pylist()))
    level = levels.get(osm_id)
    child_col = {0: "level1_id", 1: "level2_id"}.get(level)
    empty = pa.table({"child_id": pa.array([], pa.string()),
                      "doc_count": pa.array([], pa.int64())})
    if child_col is None:
        import ray.data as rd

        return rd.from_arrow(empty)
    children = pa.array(sorted(
        c for c, p in zip(boundaries["osm_id"].to_pylist(),
                          boundaries["is_in"].to_pylist()) if p == osm_id))

    def partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.fill_null(
            pc.is_in(batch[child_col], value_set=children), False))
        g = pa.TableGroupBy(hit.select([child_col]), [child_col]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["child_id", "cnt"])

    partials = join_rows_ds.map_batches(partial, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["child_id"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["child_id", "doc_count"])

    return hash_rollup(partials, ["child_id"], merge, npartitions=2,
                       batch_format="pyarrow")


def drill_down_multi(join_rows_ds, boundaries: pa.Table,
                     nodes: list[str]):
    """Several for_osm_id lookups in ONE pass over the big side: each
    node's children mask applies per batch, partial counts tag the query
    node, one tiny exchange merges. Output (query_node, child_id,
    doc_count)."""
    from ..util import hash_rollup

    levels = dict(zip(boundaries["osm_id"].to_pylist(),
                      boundaries["adminlevel"].to_pylist()))
    ids = boundaries["osm_id"].to_pylist()
    parents = boundaries["is_in"].to_pylist()
    plans = []
    for node in nodes:
        child_col = {0: "level1_id", 1: "level2_id"}.get(levels.get(node))
        if child_col is None:
            continue
        children = pa.array(sorted(
            c for c, p in zip(ids, parents) if p == node))
        plans.append((node, child_col, children))

    def partial(batch: pa.Table) -> pa.Table:
        outs = []
        for node, child_col, children in plans:
            hit = batch.filter(pc.fill_null(
                pc.is_in(batch[child_col], value_set=children), False))
            g = pa.TableGroupBy(hit.select([child_col]), [child_col]) \
                .aggregate([([], "count_all")]) \
                .rename_columns(["child_id", "cnt"])
            outs.append(g.append_column(
                "query_node", pa.array([node] * g.num_rows, pa.string())))
        return pa.concat_tables(outs) if outs else pa.table({
            "child_id": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "query_node": pa.array([], pa.string())})

    partials = join_rows_ds.map_batches(partial, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["query_node", "child_id"]).aggregate(
            [("cnt", "sum")])
        return g.rename_columns(["query_node", "child_id", "doc_count"])

    return hash_rollup(partials, ["query_node", "child_id"], merge,
                       npartitions=2, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# full pipeline + check files
# ---------------------------------------------------------------------------

@dataclass
class HierarchyResult:
    levels: dict[int, pa.Table] = field(default_factory=dict)
    discards: pa.Table | None = None
    problems: pa.Table | None = None
    unusable: frozenset[str] = frozenset()


def extract_hierarchy(raw, *, mapping_default: dict | None = None,
                      mapping_overrides: dict | None = None,
                      concurrency=None) -> HierarchyResult:
    """The §3.1 lifecycle: normalize once, then level barriers 0 -> 1 -> 2.

    The normalized Dataset is materialized once (boundary tables are the
    small side of the engine — the big side is pages); each accepted level
    is a plain Arrow table, broadcast into the next pass's actor pool."""
    norm = normalized(raw).materialize()
    res = HierarchyResult()
    res.problems = problems_table(norm)
    res.discards = discards_table(norm)
    res.unusable = unusable_ids(norm)
    res.levels[0] = accept_level0(norm)
    res.levels[1] = accept_hierarchy_level(
        norm, 1, [res.levels[0]], res.unusable,
        mapping_default=mapping_default, mapping_overrides=mapping_overrides,
        concurrency=concurrency)
    res.levels[2] = accept_hierarchy_level(
        norm, 2, [res.levels[0], res.levels[1]], res.unusable,
        mapping_default=mapping_default, mapping_overrides=mapping_overrides,
        concurrency=concurrency)
    return res


def check_file_diffs(extracted: dict[int, pa.Table],
                     golden: dict[int, set[str]]) -> dict[int, dict[str, set[str]]]:
    """A3 golden id-set regression (extract.py:27-61): per level,
    missing = golden - extracted, new = extracted - golden."""
    out: dict[int, dict[str, set[str]]] = {}
    for level, table in extracted.items():
        got = set(table["osm_id"].to_pylist())
        want = golden.get(level, set())
        out[level] = {"missing": want - got, "new": got - want}
    return out


def write_check_files(diffs: dict[int, dict[str, set[str]]], out_dir: str) -> None:
    """Write admin_{k}_{missing,new}.txt (write_admin_check_files analogue,
    extract.py:44-61): sorted, one id per line."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    for level, d in diffs.items():
        for kind in ("missing", "new"):
            path = os.path.join(out_dir, f"admin_{level}_{kind}.txt")
            with open(path, "w") as f:
                for osm_id in sorted(d[kind]):
                    f.write(f"{osm_id}\n")


def route_by_level(norm, out_dir: str) -> None:
    """extract_all.py:92-121 (M12): single pass routing every usable feature
    to per-admin-level partitions — Ray-native partitioned parquet write
    (partition dirs adminlevel=1..10 replace ten shapefile sinks)."""

    def fn(batch: pa.Table) -> pa.Table:
        keep = []
        lvl_out = []
        lvls = batch["admin_level"].to_pylist()
        reasons = batch["reason"].to_pylist()
        ids_ = batch["osm_id"].to_pylist()
        for i in range(batch.num_rows):
            ok = (reasons[i] is None and ids_[i] is not None
                  and lvls[i] is not None and lvls[i].isdigit()
                  and 1 <= int(lvls[i]) <= 10)
            keep.append(ok)
            lvl_out.append(int(lvls[i]) if ok and lvls[i] is not None
                           and lvls[i].isdigit() else 0)
        out = batch.append_column("adminlevel_part",
                                  pa.array(lvl_out, pa.int32()))
        return out.filter(pa.array(keep))

    routed = norm.map_batches(fn, batch_format="pyarrow") \
        .select_columns(["osm_id", "name", "name_en", "admin_level",
                         "iso3166", "geom_wkb", "adminlevel_part"])
    routed.write_parquet(out_dir, partition_cols=["adminlevel_part"])
