"""The flagship pipeline (rebuild lifecycle, SURVEY.md §3.4):

    read_parquet(documents) -> pages (input_hint shape)
      -> ExtractGeocodeCells actor pool   (html->text, geo meta, cells r7-9;
                                           html column dropped here)
      -> PIPJoin actor pool               (broadcast boundary indexes,
                                           hierarchical levels 0-2)
      -> tile rollup                      (salted groupby(cell))

Everything is a lazy ray.data.Dataset; nothing materializes the big side.
No function here calls ray.init() — sessions belong to the caller.
"""

from __future__ import annotations

import pyarrow as pa

from ..sources import boundaries as bsrc
from ..sources import synth
from ..stages import extract as extract_stage
from ..stages import pip_join as pip_stage
from ..stages import tiles as tiles_stage


class _ExtractPIP:
    """Fused extract+geocode+cells+PIP actor: ONE pool does the whole map
    side of the flagship. Two separate autoscaling pools (extract, PIP)
    each ramp toward the CPU count and fight for cores mid-run — the fused
    stage spawns half the actors and the extracted batch never crosses an
    object-store boundary before the join (kernel cost is ~37us/doc; the
    two-pool version's wall time was dominated by pool ramp + handoff)."""

    def __init__(self, bt_ref, slim: bool = False, drop_unmatched: bool = True):
        self._extract = extract_stage.ExtractGeocodeCells(slim=slim)
        self._pip = pip_stage.PIPJoin(bt_ref, drop_unmatched=drop_unmatched)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._pip(self._extract(batch))


def join_rows(sf_dir: str, *, replicate: int = 1, concurrency=None,
              boundaries: pa.Table | None = None, drop_unmatched: bool = True,
              slim: bool = False):
    """pages -> extracted -> PIP join rows Dataset (fused single actor
    pool). ``slim`` drops the wide string columns (url/warc_ts/text) at
    the extract stage for consumers that only need doc_id + cells
    (projection pushdown)."""
    from ..util import default_pool

    pages = synth.read_pages(sf_dir, replicate=replicate)
    bt = boundaries if boundaries is not None else bsrc.clean_boundaries()
    ref = pip_stage.boundary_ref(bt)
    return pages.map_batches(
        _ExtractPIP,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
        fn_constructor_kwargs={"bt_ref": ref, "slim": slim,
                               "drop_unmatched": drop_unmatched},
        concurrency=concurrency if concurrency is not None else default_pool(),
    )


def tiles(sf_dir: str, *, replicate: int = 1, concurrency=None,
          cell_col: str = "cell_r7"):
    """Flagship end-to-end: join rows -> per-cell tile rollup."""
    jr = join_rows(sf_dir, replicate=replicate, concurrency=concurrency,
                   slim=True)
    return tiles_stage.tile_rollup(jr, cell_col=cell_col)


def flagship(sf_dir: str = "/root/testdata/sf0.001", **kw):
    """Driver smoke entry: the tile rollup Dataset (small, stable schema)."""
    return tiles(sf_dir, **kw)


def tiles_resumable(sf_dir: str, out_dir: str, **kw) -> dict:
    """Flagship with per-partition lineage checkpoints (north rule): tile
    rollup written hive-partitioned by coarse cell range with a manifest per
    completed partition; a killed run re-invokes this and skips completed
    ranges (see posm_ray.state.checkpoint)."""
    from ..state import checkpoint

    t = tiles(sf_dir, **kw)
    return checkpoint.resumable_write(t, out_dir, cell_col="cell")
