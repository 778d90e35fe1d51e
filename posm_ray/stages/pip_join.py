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

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        finite = np.isfinite(lat) & np.isfinite(lon)
        qlat = np.where(finite, lat, 0.0)
        qlon = np.where(finite, lon, 0.0)
        l0 = self.indexes[0].query_points(qlat, qlon)
        l1 = self.indexes[1].query_points(qlat, qlon)
        l2 = self.indexes[2].query_points(qlat, qlon)
        l0[~finite] = ""
        # hierarchy consistency: child kept only under its joined parent
        pmap = self.parent_of
        l1 = np.array(
            [s if s and pmap.get(s, None) == c else "" for s, c in zip(l1, l0)],
            dtype=object,
        )
        l2 = np.array(
            [d if d and pmap.get(d, None) == s else "" for d, s in zip(l2, l1)],
            dtype=object,
        )
        out = batch.append_column(
            "level0_id", pa.array([x if x else None for x in l0], pa.string())
        )
        out = out.append_column(
            "level1_id", pa.array([x if x else None for x in l1], pa.string())
        )
        out = out.append_column(
            "level2_id", pa.array([x if x else None for x in l2], pa.string())
        )
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
