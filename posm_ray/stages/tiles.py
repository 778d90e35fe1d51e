"""Tile aggregation: groupby(cell) rollups with skew-safe pre-aggregation.

The graft's raster<->vector tile move (A1 dissolve analogue,
proc_functions.sql:289-333 — union-by-parent becomes rollup-by-cell).

Skew (SURVEY.md §4, §7.5.5): the synthetic mega-cell holds ~20% of all
rows. Naive ``groupby(cell)`` would ship every mega-cell row to one
reducer. Two defenses, both used here:

1. **Per-batch partial aggregation** inside map_batches: each batch emits at
   most one row per (cell, domain) — the exchange moves pre-reduced
   partials, not raw rows, so even the mega-cell ships only
   (#domains x #blocks) count rows.
2. **ONE hash exchange** on cell (``util.hash_rollup``) with a vectorized
   pandas rollup per partition — no per-group python dispatch, no chained
   sort-aggregates.

For rollups whose raw rows must move (no natural combiner),
``salted_counts`` splits hot keys over ``doc_id % nsalt`` sub-keys first
and merges the salts in a second, tiny exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources import synth


def _partial_pair_counts(batch: pa.Table, cell_col: str) -> pa.Table:
    """(cell, domain) -> row count within this batch (combiner step).
    Arrow-native groupby: no Arrow->pandas->Arrow round-trip per block."""
    cell = batch.column(cell_col)
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    domain = pa.array(doc_id % synth.N_DOMAINS, pa.int64())
    t = pa.table({"cell": cell, "domain": domain})
    g = pa.TableGroupBy(t, ["cell", "domain"]).aggregate([([], "count_all")])
    return g.rename_columns(["cell", "domain", "cnt"])


def tile_rollup(join_rows, cell_col: str = "cell_r7"):
    """join rows -> tiles (cell, doc_count, distinct_domains).

    partial per batch -> groupby(cell, domain) [salted shuffle] -> partial
    per batch -> groupby(cell) [tiny shuffle]. Merge is Arrow-native
    (pyarrow hash aggregation, no pandas conversion tax on the engine's
    hottest rollup).
    """
    from ..util import hash_rollup

    pairs = join_rows.map_batches(
        lambda b: _partial_pair_counts(b, cell_col), batch_format="pyarrow"
    )

    # ONE hash exchange on cell (pairs are pre-reduced per block upstream,
    # so a mega-cell ships counts, not rows), then one Arrow hash-agg per
    # partition.
    def rollup(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["cell"]).aggregate(
            [("cnt", "sum"), ("domain", "count_distinct")])
        return pa.table({
            "cell": g["cell"],
            "doc_count": g["cnt_sum"],
            "distinct_domains": pa.compute.cast(
                g["domain_count_distinct"], pa.int64()),
        })

    return hash_rollup(pairs, ["cell"], rollup, batch_format="pyarrow")


def salted_counts(ds, key_col: str, *, nsalt: int = 64, salt_src: str = "doc_id"):
    """Generic skew-safe count-by-key: partial count per (key, salt) inside
    map_batches, shuffle on the salted key, then merge salts."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        salt = batch.column(salt_src).to_numpy(zero_copy_only=False) % nsalt
        df = pd.DataFrame({"key": key, "salt": salt})
        g = df.groupby(["key", "salt"], sort=False).size().reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..util import hash_rollup

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # partial counts are pre-reduced per (key, salt) per block, so the hash
    # exchange on (key, salt) spreads a hot key over nsalt partitions; the
    # salt merge is a second (tiny) exchange on key alone
    per_salt = hash_rollup(
        partials, ["key", "salt"],
        lambda g: g.groupby(["key", "salt"], sort=False)["cnt"].sum()
        .reset_index(name="salt_cnt"))
    return hash_rollup(
        per_salt, ["key"],
        lambda g: g.groupby("key", sort=False)["salt_cnt"].sum()
        .reset_index(name="doc_count"))


def dissolve_by_parent(boundaries: pa.Table, level: int) -> pa.Table:
    """A1 dissolve analogue (proc_functions.sql:289-333): per-parent union of
    child bboxes + child count. Geometric union of the synthetic rectangles
    is their bounding box per parent; at engine level this is the per-parent
    rollup the SQL dissolve performs (ST_Union -> envelope rollup)."""
    import pyarrow.compute as pc

    from ..geom import wkb as _wkb
    from ..geom.kernels import rings_bbox

    sub = boundaries.filter(pc.equal(boundaries["adminlevel"], level))
    parents = sub["is_in"].to_pylist()
    boxes = [rings_bbox(_wkb.wkb_to_rings(b.as_py())) for b in sub["geom_wkb"]]
    df = pd.DataFrame(boxes, columns=["minx", "miny", "maxx", "maxy"])
    df["parent"] = parents
    g = df.groupby("parent", dropna=False).agg(
        minx=("minx", "min"), miny=("miny", "min"),
        maxx=("maxx", "max"), maxy=("maxy", "max"),
        n_children=("minx", "size"),
    ).reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def raster_tiles(extracted, base_res: int = 7, pix_res: int = 9):
    """Raster side of the raster<->vector tile move: per base-res cell, the
    doc count of each pix-res sub-cell ("pixel") inside it — long format
    (cell, pixel_idx, doc_count), pixel_idx = (local_ix << span) | local_iy
    where span = pix_res - base_res (grid doubles per res). Same shuffle
    shape as tile_rollup: in-batch partial counts, ONE hash exchange on the
    base cell, vectorized merge."""
    from ..util import hash_rollup

    span = pix_res - base_res
    mask = (1 << span) - 1

    def partial(batch: pa.Table) -> pa.Table:
        c_base = batch.column(f"cell_r{base_res}").to_numpy(zero_copy_only=False)
        c_pix = batch.column(f"cell_r{pix_res}").to_numpy(zero_copy_only=False)
        ix = (c_pix >> 24) & ((1 << 24) - 1)
        iy = c_pix & ((1 << 24) - 1)
        pixel = ((ix & mask) << span) | (iy & mask)
        t = pa.table({"cell": pa.array(c_base, pa.int64()),
                      "pixel_idx": pa.array(pixel, pa.int64())})
        g = pa.TableGroupBy(t, ["cell", "pixel_idx"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["cell", "pixel_idx", "cnt"])

    pairs = extracted.map_batches(partial, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["cell", "pixel_idx"]).aggregate(
            [("cnt", "sum")])
        return g.rename_columns(["cell", "pixel_idx", "doc_count"])

    return hash_rollup(pairs, ["cell"], merge, batch_format="pyarrow")


def raster_to_vector(raster_ds, *, threshold: int = 1, base_res: int = 7,
                     pix_res: int = 9):
    """The vector side of raster<->vector: threshold the raster (per-pixel
    doc counts from :func:`raster_tiles`) and emit each surviving pixel as
    a georeferenced box feature (cell, pixel_idx, doc_count,
    minx/miny/maxx/maxy) — the quantized-polygon reconstruction the
    reference's snapToGrid move feeds (POSMmanagement/process.py:85-102).
    Pure per-batch arithmetic (bit math + the cell_bounds float ops in
    cell_sql's exact order), so the DuckDB twin is bit-identical."""
    from .. import cells as cellmod

    span = pix_res - base_res
    mask = (1 << span) - 1

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.greater_equal(batch["doc_count"], threshold))
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        pix = batch.column("pixel_idx").to_numpy(zero_copy_only=False)
        bx, by = cellmod.cell_ixy(cell)
        # reconstruct the pix-res subcell from base cell + local pixel bits
        ix = (bx << span) | (pix >> span)
        iy = (by << span) | (pix & mask)
        sub = cellmod.pack(pix_res, ix, iy)
        minx, miny, maxx, maxy = cellmod.cell_bounds(sub)
        return pa.table({
            "cell": batch["cell"],
            "pixel_idx": batch["pixel_idx"],
            "doc_count": batch["doc_count"],
            "minx": pa.array(minx), "miny": pa.array(miny),
            "maxx": pa.array(maxx), "maxy": pa.array(maxy),
        })

    return raster_ds.map_batches(fn, batch_format="pyarrow")


HLL_BITS = 6  # 64 registers, ~13% standard error — mergeable sketch


def _hll_partial(batch: pa.Table, cell_col: str, bits: int) -> pa.Table:
    """Per-block HLL partial: (cell, register, rho_max) rows. Registers
    merge by MAX, so the sketch is a perfect combiner — the exchange ships
    at most (#cells x 2^bits) tiny rows per block regardless of row count
    (the mergeable-sketch pattern for distinct counts at corpus scale)."""
    cell = batch.column(cell_col).to_numpy(zero_copy_only=False)
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    domain = (doc_id % synth.N_DOMAINS).astype(np.uint64)
    # splitmix64 of the domain id
    v = domain * np.uint64(0x9E3779B97F4A7C15)
    v ^= v >> np.uint64(30); v *= np.uint64(0xBF58476D1CE4E5B9)
    v ^= v >> np.uint64(27); v *= np.uint64(0x94D049BB133111EB)
    v ^= v >> np.uint64(31)
    reg = (v >> np.uint64(64 - bits)).astype(np.int64)
    rest = (v << np.uint64(bits)) | np.uint64((1 << bits) - 1)
    # rho = leading zeros of rest + 1 — exact vectorized clz via 6 binary-
    # search shift passes (float log2 would misround near powers of two)
    clz = np.zeros(len(rest), dtype=np.uint64)
    cur = rest.copy()
    for s in (32, 16, 8, 4, 2, 1):
        hi = cur >> np.uint64(s)
        empty = hi == 0
        clz = np.where(empty, clz + np.uint64(s), clz)
        cur = np.where(empty, cur, hi)
    rho = (clz + 1).astype(np.int64)
    df = pd.DataFrame({"cell": cell, "register": reg, "rho": rho})
    g = df.groupby(["cell", "register"], sort=False)["rho"].max() \
        .reset_index(name="rho")
    return pa.Table.from_pandas(g, preserve_index=False)


def hll_registers(join_rows, cell_col: str = "cell_r7",
                  bits: int = HLL_BITS):
    """The merged HLL register state itself: (cell, register, rho) rows
    after the per-block partials and ONE hash exchange on cell.  This is
    the thing that actually moves at corpus scale (registers merge by MAX
    and are tiny); the float estimate is a trivial final on top.  All
    integer-valued, so the DuckDB twin replicates it bit-for-bit
    (splitmix64 emulated via 32-bit-split wrapping multiplies)."""
    from ..util import hash_rollup

    partials = join_rows.map_batches(
        lambda b: _hll_partial(b, cell_col, bits), batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["cell", "register"], sort=False)["rho"].max() \
            .reset_index(name="rho")

    return hash_rollup(partials, ["cell"], merge)


def approx_distinct_domains(join_rows, cell_col: str = "cell_r7",
                            bits: int = HLL_BITS):
    """Per-cell approximate distinct-domain count via a mergeable HLL-style
    sketch: per-block register partials -> ONE hash exchange on cell ->
    register max-merge -> harmonic-mean estimate with the standard
    small-range correction. ~13% std error at 64 registers; the exact
    variant (tile_rollup) shuffles (cell, domain) pairs instead."""
    from ..util import hash_rollup

    m = 1 << bits
    alpha = 0.709 if m >= 128 else (0.697 if m >= 64 else 0.673)

    partials = join_rows.map_batches(
        lambda b: _hll_partial(b, cell_col, bits), batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized register merge: max per (cell, register), then one
        grouped pass computes every cell's harmonic estimate (absent
        registers contribute 2^0 = 1 each) — no per-cell python loop."""
        mx = g.groupby(["cell", "register"], sort=False)["rho"].max() \
            .reset_index()
        mx["pw"] = np.power(2.0, -mx["rho"].to_numpy(dtype=np.float64))
        agg = mx.groupby("cell", sort=False).agg(
            present=("register", "count"), s=("pw", "sum")).reset_index()
        zeros = (m - agg["present"]).to_numpy(dtype=np.float64)
        est = alpha * m * m / (agg["s"].to_numpy() + zeros)
        use_lin = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lin = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1e-12),
                                      1.0))
        est = np.where(use_lin, lin, est)
        return pd.DataFrame({
            "cell": agg["cell"],
            "approx_distinct_domains": np.round(est).astype(np.int64),
        })

    return hash_rollup(partials, ["cell"], merge)


def tile_pyramid(join_rows, *, finest_col: str = "cell_r9",
                 levels: tuple[int, ...] = (9, 8, 7)):
    """Hierarchical tile pyramid: doc counts at every zoom level in ONE
    cascade — the raw rows shuffle once (pre-reduced per block at the
    finest res); each coarser level is derived from the FINER level's
    already-tiny aggregate via cells.parent (exact containment: ix/iy
    halve per step, and floor((x)/2**k) commutes with the cell_id floor,
    so parent counts equal direct assignment at the coarser res).

    At corpus scale this is the difference between 3 full shuffles of
    raw rows (group at r9, r8, r7 separately) and 1 full + 2 sketch-size
    exchanges.  Output: (res, cell, n_docs) for every level."""
    from .. import cells as cellmod
    from ..util import hash_rollup, pin_small

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select([finest_col]),
                            [finest_col]).aggregate([([], "count_all")])
        return g.rename_columns(["cell", "n"])

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["cell"]).aggregate([("n", "sum")])
        return g.rename_columns(["cell", "n"])

    # each level aggregate is consumed TWICE (stamped into the output and
    # lifted into the next-coarser rollup) — materialize the sketch-sized
    # aggregate so the fan-out reads blocks instead of re-executing the
    # upstream shuffle (an un-materialized hash-shuffle output referenced
    # by two branches re-runs and pins the aggregator pool; see CLAUDE.md)
    level = pin_small(hash_rollup(
        join_rows.map_batches(partial, batch_format="pyarrow"),
        ["cell"], merge, batch_format="pyarrow"))

    def stamp(res: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "res": pa.array(np.full(b.num_rows, res, dtype=np.int64)),
                "cell": b["cell"],
                "n_docs": b["n"],
            })
        return fn

    out = level.map_batches(stamp(levels[0]), batch_format="pyarrow")
    for res in levels[1:]:
        def lift(b: pa.Table, *, res=res) -> pa.Table:
            p = cellmod.parent(
                b.column("cell").to_numpy(zero_copy_only=False), res)
            return pa.table({"cell": pa.array(p, pa.int64()), "n": b["n"]})

        level = pin_small(hash_rollup(
            level.map_batches(lift, batch_format="pyarrow"),
            ["cell"], merge, batch_format="pyarrow"))
        out = out.union(level.map_batches(stamp(res), batch_format="pyarrow"))
    return out


# ---------------------------------------------------------------------------
# polygon rasterization (vector -> raster fill)
# ---------------------------------------------------------------------------

POLYFILL_RES = 4


def polygon_fill(boundaries: pa.Table, *, res: int = POLYFILL_RES,
                 adminlevel: int | None = 2):
    """Vector->raster rasterization: every grid cell at ``res`` whose
    CENTER lies inside the polygon — the inverse of
    :func:`raster_to_vector`, completing the raster<->vector pair
    (reference analogue: the ST_SnapToGrid 'raster move',
    POSMmanagement/process.py:85-102, generalized from point snapping to
    polygon interior fill).

    Scale shape: polygons fan out over tasks (``repartition`` of the
    boundary rows); each task rasterizes its polygons independently —
    candidate cells from the bbox covering, centers tested with the real
    ray-crossing PIP kernel, output streamed per polygon. No shuffle; a
    continent-sized polygon at fine ``res`` is bounded by its covering
    size and would be split by covering chunks before the PIP test (the
    per-polygon analogue of the simhash tile).

    Returns (osm_id, cell) rows. The center coordinates are computed as
    ``(ix + 0.5) / ncols * 360 - 180`` with the identical op order in the
    SQL twin; the clean-boundary fixture's rectangle edges never coincide
    with a cell center (audited by tests/test_tiles.py), so the strict
    inequality decides identically on both sides."""
    import ray.data as rd

    from .. import cells as cellmod
    from ..geom import kernels, wkb
    from ..util import default_npartitions

    bt = boundaries
    if adminlevel is not None:
        bt = bt.filter(pc.equal(bt["adminlevel"], pa.scalar(adminlevel)))
    ds = rd.from_arrow(bt.select(["osm_id", "geom_wkb"])) \
        .repartition(default_npartitions())

    nx, ny = cellmod.ncols(res), cellmod.nrows(res)

    def fill(b: pa.Table) -> pa.Table:
        out_id, out_cell = [], []
        for osm_id, geom in zip(b.column("osm_id").to_pylist(),
                                b.column("geom_wkb").to_pylist()):
            rings = wkb.wkb_to_rings(geom)
            cand = cellmod.covering(*kernels.rings_bbox(rings), res)
            ix, iy = cellmod.cell_ixy(cand)
            cx = (ix + 0.5) / nx * 360.0 - 180.0
            cy = (iy + 0.5) / ny * 180.0 - 90.0
            inside = kernels.points_in_rings(cx, cy, rings)
            out_id.extend([osm_id] * int(inside.sum()))
            out_cell.append(cand[inside])
        cellcol = (np.concatenate(out_cell) if out_cell
                   else np.array([], dtype=np.int64))
        return pa.table({"osm_id": pa.array(out_id, pa.string()),
                         "cell": pa.array(cellcol, pa.int64())})

    return ds.map_batches(fill, batch_format="pyarrow")


def polygon_fill_sql(res: int = POLYFILL_RES, adminlevel: int = 2) -> str:
    """DuckDB twin: same bbox covering (floor + clamp), same center
    expression, strict center-in-rectangle filter (== the PIP kernel's
    decision on the rectangle fixture), same packed cell id."""
    from ..sources import boundaries as bsrc

    nx, ny = 1 << (res + 7), 1 << (res + 6)

    def _clamp(expr: str, hi: int) -> str:
        return f"LEAST(GREATEST(CAST(FLOOR({expr}) AS BIGINT), 0), {hi})"

    ix0 = _clamp(f"(minx + 180.0) / 360.0 * {nx}", nx - 1)
    ix1 = _clamp(f"(maxx + 180.0) / 360.0 * {nx}", nx - 1)
    iy0 = _clamp(f"(miny + 90.0) / 180.0 * {ny}", ny - 1)
    iy1 = _clamp(f"(maxy + 90.0) / 180.0 * {ny}", ny - 1)
    # bare decimal literals parse as DECIMAL and overflow in the covering
    # arithmetic (same footgun as gadm_values_sql) -> cast once to DOUBLE
    return f"""
WITH b AS (SELECT osm_id, CAST(minx AS DOUBLE) AS minx,
                  CAST(miny AS DOUBLE) AS miny,
                  CAST(maxx AS DOUBLE) AS maxx,
                  CAST(maxy AS DOUBLE) AS maxy
           FROM (VALUES {bsrc.boundaries_values_sql(adminlevel)})
           AS t(osm_id, parent_id, minx, miny, maxx, maxy)),
cand AS (
  SELECT osm_id, minx, miny, maxx, maxy, gx.ix, gy.iy
  FROM b,
       unnest(generate_series({ix0}, {ix1})) AS gx(ix),
       unnest(generate_series({iy0}, {iy1})) AS gy(iy)),
ctr AS (
  SELECT osm_id, ix, iy,
         (CAST(ix AS DOUBLE) + 0.5) / {nx} * 360.0 - 180.0 AS cx,
         (CAST(iy AS DOUBLE) + 0.5) / {ny} * 180.0 - 90.0 AS cy,
         minx, miny, maxx, maxy
  FROM cand)
SELECT osm_id,
       (CAST({res} AS BIGINT) << 48) | (ix << 24) | iy AS cell
FROM ctr
WHERE cx > minx AND cx < maxx AND cy > miny AND cy < maxy
"""


def zonal_stats(join_rows, *, zone_col: str = "level2_id"):
    """Zonal statistics — the classic raster/vector geo op: per admin
    polygon (``zone_col`` from the PIP join), document count and total
    extracted-text characters. The per-zone aggregate a coverage
    dashboard reads after geocoding (reference analogue: posm's
    per-admin-area feature counting, proc_functions.sql duration/count
    log rows, generalized to document statistics).

    Scale shape: rows with no zone (docs outside every polygon) drop at
    the map side; blocks pre-reduce to one (zone, count, chars) row per
    zone via Arrow group-by, ONE hash exchange on zone merges the
    partials. ``length(text)`` is unicode characters on both sides
    (pc.utf8_length vs SQL length)."""
    from ..util import hash_rollup

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.is_valid(b[zone_col])
        b = b.filter(mask)
        t = pa.table({
            "zone": b[zone_col],
            "n_docs": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "sum_chars": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
        })
        g = pa.TableGroupBy(t, ["zone"]).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")])
        return g.rename_columns(["zone", "n_docs", "sum_chars"])

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["zone"]).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")])
        return g.rename_columns(["zone", "n_docs", "sum_chars"])

    return hash_rollup(join_rows.map_batches(partial,
                                             batch_format="pyarrow"),
                       ["zone"], merge, batch_format="pyarrow")


def focal_sum(extracted, *, res: int = 7, cell_col: str = "cell_r7"):
    """Focal statistics — the raster calculator's 3x3 neighborhood sum
    (sparse raster convolution) over the per-cell document-count raster.
    Output one row per cell receiving any contribution:
    (cell, center_count, focal_sum, n_contrib) — center_count is the
    cell's own doc count (0 for an empty cell lit only by populated
    neighbors, the raster's halo), focal_sum the 3x3 neighborhood total,
    n_contrib how many of the 9 neighborhood cells are populated. The
    hotspot-density smoothing every GIS raster toolbox ships alongside
    zonal stats (reference analogue: posm's ST_SnapToGrid 'raster move',
    POSMmanagement/process.py:85-102, has no focal step; this completes
    the zonal/focal pair).

    Scale shape: the convolution runs on the AGGREGATED raster (bounded
    by populated-cell cardinality, never corpus rows). Per-block Arrow
    pre-counts -> ONE hash exchange on cell merges doc counts (the
    mega-cell ships pre-reduced partials, not rows) -> vectorized 9-way
    scatter of each populated cell's count to its neighborhood targets
    (longitude WRAPS at the antimeridian like :func:`cells.neighbors`;
    latitude edge rows DROP out-of-grid offsets — a pole clamp would
    double-count) -> ONE hash exchange on the target cell with an
    Arrow-native integer-sum merge. All-integer output, exact SQL twin."""
    from .. import cells as cellmod
    from ..util import hash_rollup

    nx, ny = cellmod.ncols(res), cellmod.nrows(res)

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select([cell_col]), [cell_col]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["cell", "cnt"])

    def merge_counts(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["cell"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["cell", "cnt"])

    counts = hash_rollup(
        extracted.map_batches(partial, batch_format="pyarrow"),
        ["cell"], merge_counts, batch_format="pyarrow")

    def scatter(b: pa.Table) -> pa.Table:
        cell = b.column("cell").to_numpy(zero_copy_only=False)
        cnt = b.column("cnt").to_numpy(zero_copy_only=False)
        ix, iy = cellmod.cell_ixy(cell)
        tgts, cnts, centers = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jy = iy + dy
                ok = (jy >= 0) & (jy < ny)
                tgts.append(cellmod.pack(res, (ix[ok] + dx) % nx, jy[ok]))
                c = cnt[ok]
                cnts.append(c)
                centers.append(c if dx == 0 and dy == 0
                               else np.zeros(len(c), np.int64))
        return pa.table({
            "cell": pa.array(np.concatenate(tgts), pa.int64()),
            "cnt": pa.array(np.concatenate(cnts), pa.int64()),
            "center_cnt": pa.array(np.concatenate(centers), pa.int64()),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["cell"]).aggregate(
            [("center_cnt", "sum"), ("cnt", "sum"), ([], "count_all")])
        return pa.table({
            "cell": g["cell"],
            "center_count": g["center_cnt_sum"],
            "focal_sum": g["cnt_sum"],
            "n_contrib": pc.cast(g["count_all"], pa.int64()),
        })

    return hash_rollup(counts.map_batches(scatter, batch_format="pyarrow"),
                       ["cell"], merge, batch_format="pyarrow")
