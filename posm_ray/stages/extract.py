"""Extraction stage: html -> text + geocode + cell assignment.

One actor-pool map_batches stage does all three per-row derivations in a
single pass over the batch (one traversal of the big side, SURVEY.md J2
pattern), then DROPS the html column — the wide binary payload never crosses
another stage boundary (projection pushdown, SURVEY.md §7.5.8).

Reference analogues: FeatureReader streaming (exposm/reader.py:37-73) ->
Arrow batches; representative_point (extract.py:211-213) -> the page's
geo.position point; snapToGrid raster move -> cell assignment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cells
from ..functions import text as textfn

from ..util import default_pool

CELL_RESES = (7, 8, 9)


class ExtractGeocodeCells:
    """Callable-class stage for ``map_batches(..., concurrency=N)``.

    __init__ (once per actor) owns compiled regexes via the functions.text
    module import; __call__ handles one Arrow batch zero-copy in, Arrow out.
    """

    def __init__(self, reses: tuple[int, ...] = CELL_RESES,
                 slim: bool = False):
        self.reses = reses
        # slim=True drops the wide string columns (url/warc_ts/text) right
        # here — the html-projection rule (SURVEY §7.5.8) applied one stage
        # earlier for consumers (tile rollups) that only need doc_id + cells
        self.slim = slim

    def __call__(self, batch: pa.Table) -> pa.Table:
        # per-row compiled-regex extractor: measured FASTER than the
        # Arrow-RE2 batch kernels on this payload (11.9 vs 16.4 us/doc —
        # one fused pass per row beats four vectorized passes over ~1.5 KB
        # strings), and extract is <2% of flagship wall either way
        html = batch.column("html").to_pylist()
        extracted_list = [textfn.extract_text(h) for h in html]
        extracted = pa.array(extracted_list, pa.string())
        geo = [textfn.geocode_meta(h) for h in html]
        lat = np.array([g[0] if g else np.nan for g in geo], dtype=np.float64)
        lon = np.array([g[1] if g else np.nan for g in geo], dtype=np.float64)
        geocoded = np.isfinite(lat) & np.isfinite(lon)
        cols = {}
        if not self.slim:
            cols.update({
                "url": batch.column("url"),
                "warc_ts": batch.column("warc_ts"),
            })
        cols.update({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
        })
        if not self.slim:
            cols["text"] = extracted
        cols.update({
            "lat": pa.array(lat),
            "lon": pa.array(lon),
            "geocoded": pa.array(geocoded),
        })
        if not self.slim and "text" in batch.column_names:
            import pyarrow.compute as pc

            cols["byte_identical"] = pc.equal(extracted,
                                              batch.column("text"))
        for r in self.reses:
            # cell of non-geocoded rows is a clamped sentinel; filtered later
            cols[f"cell_r{r}"] = pa.array(cells.cell_id(lat, lon, r))
        return pa.table(cols)


def extracted_pages(pages, *, concurrency=None, batch_size: int | None = None,
                    slim: bool = False):
    """pages Dataset -> extracted/geocoded/cell-assigned Dataset (html
    dropped). Actor pool sized by ``concurrency`` (None -> Ray autoscale).

    batch_size defaults to None (one batch per block): a fixed batch_size
    larger than the upstream block size makes the fused operator COALESCE
    blocks, capping task parallelism at rows/batch_size regardless of CPUs
    (measured: 64 input blocks -> 5 tasks at batch_size=1024). Block size
    is the parallelism knob; set batch_size only to SHRINK oversized
    blocks (e.g. wide binary payloads)."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size,
                  zero_copy_batch=True,
                  fn_constructor_kwargs={"slim": slim},
                  concurrency=concurrency if concurrency is not None else default_pool())
    return pages.map_batches(ExtractGeocodeCells, **kwargs)


# ---------------------------------------------------------------------------
# link graph (href extraction -> in-degree per target)
# ---------------------------------------------------------------------------

class LinkExtract:
    """Actor stage: raw html bytes -> (host, path) link targets, one row
    per href occurrence. The regex compiles once per actor and runs over
    the undecoded bytes (hrefs are ASCII in any charset the corpus
    carries); site-relative hrefs resolve against the page's canonical
    host, absolute http(s) hrefs against their own, anything else
    (fragments, mailto, protocol-relative) is dropped."""

    def __init__(self):
        import re

        self.href_re = re.compile(rb'href="([^"]*)"')

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import urls as urlfn

        htmls = batch.column("html").to_pylist()
        page_urls = batch.column("url").to_pylist()
        out_host, out_path = [], []
        for url, html in zip(page_urls, htmls):
            page_host = urlfn.canonicalize(url)[0]
            for m in self.href_re.finditer(html):
                href = m.group(1).decode("ascii", "ignore")
                if href.startswith("http://") or href.startswith("https://"):
                    host, surt = urlfn.canonicalize(href)
                    path = surt.split(")", 1)[1].split("?", 1)[0] or "/"
                elif href.startswith("/") and not href.startswith("//"):
                    host = page_host
                    path = href.split("?", 1)[0].split("#", 1)[0]
                else:
                    continue
                out_host.append(host)
                out_path.append(path)
        t = pa.table({"host": pa.array(out_host, pa.string()),
                      "path": pa.array(out_path, pa.string())})
        # in-block pre-count (combiner): one row per distinct target per
        # block leaves the stage, not one per href occurrence
        g = pa.TableGroupBy(t, ["host", "path"]).aggregate([([], "count_all")])
        return g.rename_columns(["host", "path", "n_in"])


def link_graph(pages, *, concurrency=None, npartitions: int | None = None):
    """In-degree per link target over the crawl: parse hrefs from the raw
    html in an actor pool, pre-count per block, ONE hash exchange on the
    (host, path) target key, vectorized sum per partition. The web
    link-analysis primitive (in-degree is the input to any centrality /
    spam-score stage); the exchange ships counted targets, never hrefs."""
    from ..util import hash_rollup

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None,
                  concurrency=concurrency if concurrency is not None
                  else default_pool())
    partials = pages.map_batches(LinkExtract, **kwargs)

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["host", "path"]).aggregate([("n_in", "sum")])
        return g.rename_columns(["host", "path", "n_in"])

    return hash_rollup(partials, ["host", "path"], merge,
                       npartitions=npartitions, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# boundary extraction from text (north-star admin-polygon stage)
# ---------------------------------------------------------------------------

class BoundaryFromText:
    """Actor-pool stage: boundary-bearing pages -> raw boundary rows
    (layer, osm_id_raw, osm_way_id_raw, name, name_en, admin_level,
    boundary, iso3166, geom_wkb). The geo+json script-block regex compiles
    once per actor; rings re-encode to WKB with the same canonical writer
    the loaders use, so extraction is byte-lossless. This is the
    north-star 'extract OSM-style admin polygons from text' stage — the
    posm reader (exposm/reader.py:37-73) re-expressed over web pages."""

    _COLS = ("layer", "osm_id_raw", "osm_way_id_raw", "name", "name_en",
             "admin_level", "boundary", "iso3166")

    def __init__(self):
        import re

        self.block_re = re.compile(
            rb'<script type="application/geo\+json">(.*?)</script>', re.S)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        from ..geom import wkb as wkbmod

        cols: dict[str, list] = {c: [] for c in self._COLS}
        geoms: list[bytes] = []
        for html in batch.column("html").to_pylist():
            m = self.block_re.search(html)
            if not m:
                continue
            row = json.loads(m.group(1))
            for c in self._COLS:
                cols[c].append(row.get(c))
            if "rings" in row:
                geoms.append(wkbmod.rings_to_wkb(
                    [np.asarray(r, dtype=np.float64)
                     for r in row["rings"]]))
            else:
                geoms.append(bytes.fromhex(row["wkb_hex"]))
        out = {c: pa.array(cols[c], pa.string()) for c in self._COLS}
        out["geom_wkb"] = pa.array(geoms, pa.binary())
        return pa.table(out)


def boundaries_from_pages(pages, *, concurrency=None) -> pa.Table:
    """pages Dataset -> raw boundary TABLE (small side by nature: admin
    polygons are a sketch-size fraction of any crawl). The actor pool does
    the parse; the collected Arrow table then feeds the normalize /
    hierarchy pipeline exactly like a file-loaded boundary set."""
    import ray

    out = pages.map_batches(
        BoundaryFromText,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
        concurrency=concurrency if concurrency is not None else default_pool(),
    )
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables)
