"""Hierarchical point-in-polygon join — the heart of the engine.

Ray-Data-native rebuild of posm's three extraction passes
(extract.py:92-355): instead of three sequential full scans of the input
probing per-level rtree+prepared-dict state, ONE actor-pool map_batches pass
probes a *stack* of per-level grid indexes built once per actor from a
broadcast boundary table (SURVEY.md J1/J2/X1-X3 mapping).

Broadcast, not shuffle: the boundary table is the small side; it is
``ray.put`` once on the driver and each actor materializes its indexes in
``__init__`` (the X1 rtree + X2 prepared-geometry analogue). The big side
(documents) streams through with zero-copy Arrow batches; no all-to-all
exchange happens in this stage at any scale.

Semantics (matching extract.py passes, made deterministic):
- a point joins level 0 by PIP (min-osm_id wins on overlap — documented
  deviation from rtree iteration order, SURVEY.md §7.5.2);
- level-1 match is kept only when its ``is_in`` parent equals the level-0
  winner (extract.py:211-243 drop-if-no-parent);
- level-2 match is kept only when its parent equals the level-1 winner
  (extract.py:303-351);
- rows with no level-0 country are dropped from the join output
  (posm drops features whose representative point hits no parent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import wkb
from ..geom.index import GridIndex

LEVELS = (0, 1, 2)


def boundary_ref(boundaries: pa.Table):
    """Broadcast the boundary table once (driver side): ray.put of the Arrow
    table. Actors read it in __init__ — it is NOT re-shipped per batch."""
    import ray

    return ray.put(boundaries)


def build_level_indexes(bt: pa.Table) -> tuple[dict[int, GridIndex], dict[str, str]]:
    """Per-level GridIndex stack + child->parent map from a boundaries table
    with columns (osm_id, adminlevel, is_in, geom_wkb)."""
    import pyarrow.compute as pc

    indexes: dict[int, GridIndex] = {}
    parent_of: dict[str, str] = {}
    for level in LEVELS:
        sub = bt.filter(pc.equal(bt["adminlevel"], level))
        ids = sub["osm_id"].to_pylist()
        rings = [wkb.wkb_to_rings(b.as_py()) for b in sub["geom_wkb"]]
        indexes[level] = GridIndex(ids, rings)
        for osm_id, is_in in zip(ids, sub["is_in"].to_pylist()):
            if is_in is not None:
                parent_of[osm_id] = is_in
    return indexes, parent_of


class PIPJoin:
    """Actor-pool stage: adds level0_id/level1_id/level2_id to each batch.

    ``bt_ref`` is the ray.put ObjectRef of the boundary table (or the table
    itself in tests). Index build cost is paid once per actor.
    """

    def __init__(self, bt_ref, drop_unmatched: bool = True):
        bt = bt_ref
        if not isinstance(bt, pa.Table):
            import ray

            bt = ray.get(bt_ref)
        self.indexes, self.parent_of = build_level_indexes(bt)
        self.drop_unmatched = drop_unmatched
        # dictionary-encode the hierarchy ONCE per actor (VERDICT r4 #5):
        # par1[i] = level-0 index of level-1 polygon i's is_in parent (or
        # -2), par2 likewise into level 1 — the per-batch consistency check
        # is then two int array compares instead of a python loop over
        # string ids (the only row-at-a-time loop on the flagship path).
        pos0 = {osm: i for i, osm in enumerate(self.indexes[0].ids)}
        pos1 = {osm: i for i, osm in enumerate(self.indexes[1].ids)}
        self.par1 = np.array(
            [pos0.get(self.parent_of.get(osm), -2)
             for osm in self.indexes[1].ids], dtype=np.int64)
        self.par2 = np.array(
            [pos1.get(self.parent_of.get(osm), -2)
             for osm in self.indexes[2].ids], dtype=np.int64)
        # ids + trailing None so a -1 miss fancy-indexes to null
        self.vals = {
            lv: np.array(self.indexes[lv].ids + [None], dtype=object)
            for lv in LEVELS
        }

    def _id_col(self, lv: int, idx: np.ndarray) -> pa.Array:
        miss = len(self.indexes[lv].ids)
        return pa.array(self.vals[lv][np.where(idx >= 0, idx, miss)],
                        pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        finite = np.isfinite(lat) & np.isfinite(lon)
        qlat = np.where(finite, lat, 0.0)
        qlon = np.where(finite, lon, 0.0)
        i0 = self.indexes[0].query_points_idx(qlat, qlon)
        i1 = self.indexes[1].query_points_idx(qlat, qlon)
        i2 = self.indexes[2].query_points_idx(qlat, qlon)
        i0[~finite] = -1
        # hierarchy consistency: child kept only under its joined parent
        if len(self.par1):
            ok1 = (i1 >= 0) & (i0 >= 0) & \
                (self.par1[np.maximum(i1, 0)] == i0)
            i1 = np.where(ok1, i1, -1)
        if len(self.par2):
            ok2 = (i2 >= 0) & (i1 >= 0) & \
                (self.par2[np.maximum(i2, 0)] == i1)
            i2 = np.where(ok2, i2, -1)
        out = batch.append_column("level0_id", self._id_col(0, i0))
        out = out.append_column("level1_id", self._id_col(1, i1))
        out = out.append_column("level2_id", self._id_col(2, i2))
        if self.drop_unmatched:
            import pyarrow.compute as pc

            out = out.filter(pc.is_valid(out["level0_id"]))
        return out


def pip_joined(extracted, boundaries: pa.Table, *, concurrency=None,
               batch_size: int | None = None, drop_unmatched: bool = True):
    """extracted Dataset (lat/lon columns) -> join rows Dataset."""
    ref = boundary_ref(boundaries)
    kwargs = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={"bt_ref": ref, "drop_unmatched": drop_unmatched},
    )
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    else:
        # autoscaling pool: min 1 so actor CPUs never starve the
        # shuffle/reduce tasks of downstream all-to-all operators
        from ..util import default_pool

        kwargs["concurrency"] = default_pool()
    return extracted.map_batches(PIPJoin, **kwargs)


# ---------------------------------------------------------------------------
# bbox spatial join (rect x rect) via covering-cell co-partition
# ---------------------------------------------------------------------------

BBOX_JOIN_RES = 4


def bbox_join(queries, rects: pa.Table, *, res: int = BBOX_JOIN_RES,
              npartitions: int | None = None):
    """Distributed rectangle-intersection join: streaming query boxes
    (qid, qminx, qminy, qmaxx, qmaxy) x a rectangle table
    (osm_id, minx, miny, maxx, maxy) — the polygon-x-polygon join
    primitive (candidate generation by shared covering cell) that PIP
    handles for points. NEITHER side broadcasts: both explode to their
    bbox covering at ``res`` and co-partition on cell (one tagged-union
    exchange); each partition joins its cells vectorized and tests strict
    interval overlap.

    Duplicate suppression is the REPORT-ONCE trick (classic grid spatial
    join): a pair sharing many cells is emitted only in the
    lexicographically-lowest cell of its intersection bbox's covering —
    computable locally from the two boxes, so no dedup exchange is
    needed. Exact output: (qid, osm_id) for every strictly-intersecting
    pair, each exactly once."""
    import pandas as pd

    import ray.data as rd

    from .. import cells as cellmod
    from ..util import default_npartitions, hash_rollup

    nx, ny = cellmod.ncols(res), cellmod.nrows(res)

    def explode_q(b: pa.Table) -> pa.Table:
        qid = b.column("qid").to_numpy(zero_copy_only=False)
        cols = {c: b.column(c).to_numpy(zero_copy_only=False)
                for c in ("qminx", "qminy", "qmaxx", "qmaxy")}
        out = {"cell": [], "qid": [], "qminx": [], "qminy": [],
               "qmaxx": [], "qmaxy": []}
        for i in range(len(qid)):
            cov = cellmod.covering(cols["qminx"][i], cols["qminy"][i],
                                   cols["qmaxx"][i], cols["qmaxy"][i], res)
            out["cell"].append(cov)
            for c in ("qminx", "qminy", "qmaxx", "qmaxy"):
                out[c].append(np.full(len(cov), cols[c][i]))
            out["qid"].append(np.full(len(cov), qid[i], dtype=np.int64))
        t = pa.table({
            "cell": pa.array(np.concatenate(out["cell"]) if out["cell"]
                             else np.array([], dtype=np.int64)),
            "qid": pa.array(np.concatenate(out["qid"]) if out["qid"]
                            else np.array([], dtype=np.int64)),
            **{c: pa.array(np.concatenate(out[c]) if out[c]
                           else np.array([], dtype=np.float64))
               for c in ("qminx", "qminy", "qmaxx", "qmaxy")},
        })
        return t.append_column("side", pa.array(
            np.zeros(t.num_rows, dtype=np.int8)))

    # rect side: small here (admin fixtures) but exploded the same way —
    # the shape is symmetric, so neither side ever needs to fit anywhere
    rows = {"cell": [], "osm_id": [], "minx": [], "miny": [],
            "maxx": [], "maxy": []}
    for r in rects.to_pylist():
        cov = cellmod.covering(r["minx"], r["miny"], r["maxx"], r["maxy"],
                               res)
        rows["cell"].append(cov)
        rows["osm_id"].append(np.array([r["osm_id"]] * len(cov),
                                       dtype=object))
        for c in ("minx", "miny", "maxx", "maxy"):
            rows[c].append(np.full(len(cov), r[c]))
    rect_t = pa.table({
        "cell": pa.array(np.concatenate(rows["cell"])),
        "osm_id": pa.array(np.concatenate(rows["osm_id"]).tolist(),
                           pa.string()),
        **{c: pa.array(np.concatenate(rows[c]))
           for c in ("minx", "miny", "maxx", "maxy")},
    })

    def rect_side(b: pa.Table) -> pa.Table:
        qn = pa.nulls(b.num_rows, pa.int64())
        fn = pa.nulls(b.num_rows, pa.float64())
        return pa.table({
            "cell": b["cell"], "qid": qn,
            "qminx": fn, "qminy": fn, "qmaxx": fn, "qmaxy": fn,
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            "osm_id": b["osm_id"], "minx": b["minx"], "miny": b["miny"],
            "maxx": b["maxx"], "maxy": b["maxy"],
        })

    def q_side_pad(b: pa.Table) -> pa.Table:
        sn = pa.nulls(b.num_rows, pa.string())
        fn = pa.nulls(b.num_rows, pa.float64())
        return pa.table({
            "cell": b["cell"], "qid": b["qid"],
            "qminx": b["qminx"], "qminy": b["qminy"],
            "qmaxx": b["qmaxx"], "qmaxy": b["qmaxy"],
            "side": b["side"],
            "osm_id": sn, "minx": fn, "miny": fn, "maxx": fn, "maxy": fn,
        })

    tagged = queries.map_batches(explode_q, batch_format="pyarrow") \
        .map_batches(q_side_pad, batch_format="pyarrow") \
        .union(rd.from_arrow(rect_t)
               .map_batches(rect_side, batch_format="pyarrow"))

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "osm_id": pd.Series([], dtype=object)})
        q = g.loc[g["side"] == 0,
                  ["cell", "qid", "qminx", "qminy", "qmaxx", "qmaxy"]]
        r = g.loc[g["side"] == 1,
                  ["cell", "osm_id", "minx", "miny", "maxx", "maxy"]]
        if q.empty or r.empty:
            return empty
        m = q.merge(r, on="cell")
        if m.empty:
            return empty
        # strict interval overlap on both axes
        ok = (m["qminx"].to_numpy() < m["maxx"].to_numpy()) & \
             (m["qmaxx"].to_numpy() > m["minx"].to_numpy()) & \
             (m["qminy"].to_numpy() < m["maxy"].to_numpy()) & \
             (m["qmaxy"].to_numpy() > m["miny"].to_numpy())
        m = m[ok]
        if m.empty:
            return empty
        # report-once: this cell must be the lowest covering cell of the
        # intersection bbox (floor of its min corner, clamped like
        # cells.covering)
        iminx = np.maximum(m["qminx"].to_numpy(), m["minx"].to_numpy())
        iminy = np.maximum(m["qminy"].to_numpy(), m["miny"].to_numpy())
        ix0 = np.clip(np.floor((iminx + 180.0) / 360.0 * nx),
                      0, nx - 1).astype(np.int64)
        iy0 = np.clip(np.floor((iminy + 90.0) / 180.0 * ny),
                      0, ny - 1).astype(np.int64)
        rep = cellmod.pack(res, ix0, iy0)
        m = m[m["cell"].to_numpy() == rep]
        return pd.DataFrame({"doc_id": m["qid"].to_numpy(dtype=np.int64),
                             "osm_id": m["osm_id"].to_numpy()})

    return hash_rollup(tagged, ["cell"], join_part,
                       npartitions=npartitions)
