"""Deterministic synthesis of the Common-Crawl-style pages table.

BASELINE.json input_hint mandates the input shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data exists in this sandbox, so pages are synthesized
deterministically from the driver tables (``documents.parquet``): every
derived column is a pure function of ``doc_id`` (plus the doc's own
text/lang), and each derivation has an exact ANSI-SQL twin so the DuckDB
oracle can verify end-to-end pipelines value-for-value.

The skew knob (FIXTURES.md §1): every 5th doc geocodes to one mega-cell
(Kathmandu) to exercise hot-cell salting in the tile aggregation.

IMPORTANT: numpy and SQL expressions use identical integer arithmetic and
identical double op order, so results are bit-identical across engines.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# -- derivation constants (never change without bumping EXTRACTOR_VERSION) --
N_DOMAINS = 100
SKEW_MOD = 5  # doc_id % 5 == 0 -> mega-cell
MEGA_LAT = 27.7172
MEGA_LON = 85.324
LAT_MUL, LAT_MOD = 9973, 1_600_000   # -> [-80, 80)
LON_MUL, LON_MOD = 7919, 3_600_000   # -> [-180, 180)
BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")
MALFORMED_MOD = 17  # doc_id % 17 == 0 -> malformed html (unclosed tags)

EXTRACTOR_VERSION = 1  # frozen text extractor (SURVEY.md §7.5.1)


# ---------------------------------------------------------------------------
# numpy / arrow derivations
# ---------------------------------------------------------------------------

def derive_lat(doc_id: np.ndarray) -> np.ndarray:
    doc_id = np.asarray(doc_id, dtype=np.int64)
    lat = ((doc_id * LAT_MUL) % LAT_MOD) / 10000.0 - 80.0
    return np.where(doc_id % SKEW_MOD == 0, MEGA_LAT, lat)


def derive_lon(doc_id: np.ndarray) -> np.ndarray:
    doc_id = np.asarray(doc_id, dtype=np.int64)
    lon = ((doc_id * LON_MUL) % LON_MOD) / 10000.0 - 180.0
    return np.where(doc_id % SKEW_MOD == 0, MEGA_LON, lon)


def derive_url(doc_id: np.ndarray) -> list[str]:
    doc_id = np.asarray(doc_id, dtype=np.int64)
    dom = doc_id % N_DOMAINS
    return [f"https://example-{d}.test/page/{i}" for d, i in zip(dom, doc_id)]


def derive_domain(doc_id: np.ndarray) -> list[str]:
    doc_id = np.asarray(doc_id, dtype=np.int64)
    return [f"example-{d}.test" for d in doc_id % N_DOMAINS]


def derive_warc_ts(doc_id: np.ndarray) -> np.ndarray:
    doc_id = np.asarray(doc_id, dtype=np.int64)
    return BASE_TS + doc_id.astype("timedelta64[s]").astype("timedelta64[us]")


# ---------------------------------------------------------------------------
# SQL twins (DuckDB oracle)
# ---------------------------------------------------------------------------

def lat_sql(doc: str = "doc_id") -> str:
    return (
        f"CASE WHEN {doc} % {SKEW_MOD} = 0 THEN {MEGA_LAT} "
        f"ELSE (({doc} * {LAT_MUL}) % {LAT_MOD}) / 10000.0 - 80.0 END"
    )


def lon_sql(doc: str = "doc_id") -> str:
    return (
        f"CASE WHEN {doc} % {SKEW_MOD} = 0 THEN {MEGA_LON} "
        f"ELSE (({doc} * {LON_MUL}) % {LON_MOD}) / 10000.0 - 180.0 END"
    )


def url_sql(doc: str = "doc_id") -> str:
    return (
        f"'https://example-' || CAST({doc} % {N_DOMAINS} AS VARCHAR) "
        f"|| '.test/page/' || CAST({doc} AS VARCHAR)"
    )


def domain_sql(doc: str = "doc_id") -> str:
    return f"'example-' || CAST({doc} % {N_DOMAINS} AS VARCHAR) || '.test'"


def warc_ts_sql(doc: str = "doc_id") -> str:
    return f"TIMESTAMP '2025-01-01 00:00:00' + to_seconds({doc})"


# ---------------------------------------------------------------------------
# page (html) builder — a vectorized map_batches stage
# ---------------------------------------------------------------------------

_NAV = '<nav class="site-nav"><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav>'


def build_html(doc_id: int, text: str, lang: str, lat: float, lon: float,
               domain: str) -> bytes:
    """Templated page embedding the doc text (escaped) inside <article>, a
    geo.position meta tag, and boilerplate; every MALFORMED_MOD-th page has
    unclosed tags OUTSIDE the article to exercise the extractor's tolerance."""
    malformed = doc_id % MALFORMED_MOD == 0
    nav = _NAV if not malformed else '<nav class="site-nav"><a href="/">home</a> <div><span>about'
    footer = (
        f"<footer>&copy; {domain} crawl 2025</footer>" if not malformed
        else f"<footer><b>&copy; {domain} crawl 2025"
    )
    parts = [
        "<!DOCTYPE html>\n",
        f'<html lang="{lang}">\n<head>\n<meta charset="utf-8">\n',
        f'<meta name="geo.position" content="{lat};{lon}">\n',
        f"<title>Document {doc_id}</title>\n</head>\n<body>\n",
        nav, "\n",
        f"<header><h1>Document {doc_id}</h1></header>\n",
        f'<article data-doc="{doc_id}">{_html.escape(text)}</article>\n',
        footer, "\n</body>" + ("" if malformed else "\n</html>") + "\n",
    ]
    return "".join(parts).encode("utf-8")


def pages_batch(batch: pa.Table) -> pa.Table:
    """documents batch (doc_id, text, lang) -> pages batch
    (url, warc_ts, html, text, lang, doc_id). Vectorized derivations; html
    templating is a per-row join of precomputed pieces (string building —
    inherently per-row — over already-small string data, not the hot path)."""
    doc_id = batch.column("doc_id").to_numpy()
    text = batch.column("text").to_pylist()
    lang = batch.column("lang").to_pylist()
    lat = derive_lat(doc_id)
    lon = derive_lon(doc_id)
    domain = derive_domain(doc_id)
    html_col = [
        build_html(int(i), t, lg, float(la), float(lo), dm)
        for i, t, lg, la, lo, dm in zip(doc_id, text, lang, lat, lon, domain)
    ]
    return pa.table(
        {
            "url": pa.array(derive_url(doc_id), type=pa.string()),
            "warc_ts": pa.array(derive_warc_ts(doc_id)),
            "html": pa.array(html_col, type=pa.binary()),
            "text": batch.column("text"),
            "lang": batch.column("lang"),
            "doc_id": batch.column("doc_id"),
        }
    )


def read_pages(sf_dir: str, *, replicate: int = 1, columns: list[str] | None = None):
    """Pages Dataset for an sf dir: read documents (column-pruned) and derive
    the input_hint shape. ``replicate`` > 1 explodes each batch into k
    id-shifted copies (distinct doc_ids/urls) IN-stream for bench-scale
    inputs — one read, k x rows per block, instead of unioning k reads
    (which at high CPU counts fragments into thousands of tiny blocks and
    inverts scaling)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    if replicate > 1:
        n = _doc_count(sf_dir)
        shift = int(10 ** np.ceil(np.log10(max(n, 1) + 1)))

        def explode(t: pa.Table) -> pa.Table:
            parts = [t]
            idx = t.schema.get_field_index("doc_id")
            for k in range(1, replicate):
                did = pc.add(t.column("doc_id"), pa.scalar(k * shift, pa.int64()))
                parts.append(t.set_column(idx, "doc_id", did))
            return pa.concat_tables(parts)

        ds = ds.map_batches(explode, batch_format="pyarrow")
    ds = ds.map_batches(pages_batch, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def _doc_count(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


# ---------------------------------------------------------------------------
# boundary-bearing pages (north-star: admin polygons extracted FROM TEXT)
# ---------------------------------------------------------------------------

def boundary_pages() -> pa.Table:
    """Render the raw boundary fixture as web PAGES: each feature's
    attributes + rings are embedded in the html as an
    ``application/geo+json`` script block (coordinate lists for parseable
    geometry; a wkb_hex passthrough for the corrupt-WKB validity-gate
    row). The BoundaryFromText actor pool (stages.extract) parses these
    back — the north star's 'extract OSM-style admin polygons from text'
    stage, end-to-end lossless (json float repr round-trips float64
    exactly, so re-encoded WKB is byte-identical)."""
    import json

    from ..geom import wkb as wkbmod
    from . import boundaries as bsrc

    raw = bsrc.raw_boundaries()
    urls, htmls = [], []
    for i in range(raw.num_rows):
        row = {c: raw.column(c)[i].as_py() for c in raw.column_names}
        geom = row.pop("geom_wkb")
        try:
            rings = wkbmod.wkb_to_rings(geom)
            row["rings"] = [[[float(x), float(y)] for x, y in r]
                            for r in rings]
            enc = wkbmod.rings_to_wkb(
                [np.asarray(r, dtype=np.float64) for r in row["rings"]])
            if enc != geom:  # non-canonical wkb: fall back to passthrough
                row.pop("rings")
                row["wkb_hex"] = geom.hex()
        except Exception:
            row["wkb_hex"] = geom.hex()
        payload = json.dumps(row, allow_nan=False, sort_keys=True)
        urls.append(f"https://boundaries.test/feature/{i}")
        htmls.append((
            "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
            f"<title>Boundary {i}</title></head>\n<body>\n"
            "<nav><a href=\"/\">boundaries</a></nav>\n"
            f'<script type="application/geo+json">{payload}</script>\n'
            "</body></html>\n").encode("utf-8"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(derive_warc_ts(np.arange(raw.num_rows))),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array([""] * raw.num_rows, pa.string()),
        "lang": pa.array(["en"] * raw.num_rows, pa.string()),
    })
