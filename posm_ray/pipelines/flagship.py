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


def join_rows(sf_dir: str, *, replicate: int = 1, concurrency=None,
              boundaries: pa.Table | None = None, drop_unmatched: bool = True,
              slim: bool = False):
    """pages -> extracted -> PIP join rows Dataset. ``slim`` drops the wide
    string columns (url/warc_ts/text) at the extract stage for consumers
    that only need doc_id + cells (projection pushdown).

    Deliberately TWO actor pools (extract, PIP), not one fused stage: a
    fused single-pool variant was measured SLOWER (clean-window medians
    14.1 s vs 12.5 s on the 2M-doc headline) — the separate pools pipeline
    batch i's extraction with batch i-1's join, and the cheap PIP pool
    builds its boundary indexes concurrently with the first extract wave
    instead of serializing index build into every actor's startup."""
    pages = synth.read_pages(sf_dir, replicate=replicate)
    extracted = extract_stage.extracted_pages(pages, concurrency=concurrency,
                                              slim=slim)
    bt = boundaries if boundaries is not None else bsrc.clean_boundaries()
    return pip_stage.pip_joined(extracted, bt, concurrency=concurrency,
                                drop_unmatched=drop_unmatched)


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
