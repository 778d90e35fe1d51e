"""Pure-python ESRI Shapefile (.shp/.dbf) + GeoJSON file readers and a
minimal shapefile writer — real boundary-file ingestion for the GADM /
GeoJSON sources (reference extract_gadm.py:32-40 unzips an archive and
globs ``*.shp`` sorted, one file per admin level; extract_geojson.py:48-59
reads GeoJSON via OGR). No GDAL exists in this environment, so both
formats are parsed from their public specs (ESRI Shapefile Technical
Description, July 1998; RFC 7946 GeoJSON):

- ``.shp``: 100-byte header (file code 9994 big-endian, shape type
  little-endian), records of (big-endian record header, little-endian
  Polygon payload: bbox, numParts, numPoints, part offsets, xy doubles).
  Shape types supported: 5 Polygon (+ 15 PolygonZ / 25 PolygonM, extra
  dims ignored) and 0 Null.
- ``.dbf`` (dBASE III): 32-byte header (record count / header size /
  record size), 32-byte field descriptors to the 0x0D terminator, fixed
  width latin-1 records with a deletion flag byte.

Geometry lands as the repo's WKB MultiPolygon binary column
(geom.wkb.rings_to_wkb — the ForceToMultiPolygon M9 normalization,
extract_gadm.py:78).
"""

from __future__ import annotations

import glob
import json
import os
import struct
import tempfile
import zipfile

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkbmod

_SHP_POLYGON_TYPES = {5, 15, 25}


# ---------------------------------------------------------------------------
# .shp
# ---------------------------------------------------------------------------

def read_shp(path: str) -> list[list[np.ndarray] | None]:
    """Per-record ring lists (None for Null-shape records), file order."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 100:
        raise ValueError(f"{path}: truncated shapefile header")
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError(f"{path}: bad file code {code} (want 9994)")
    out: list[list[np.ndarray] | None] = []
    pos = 100
    n = len(buf)
    while pos + 8 <= n:
        _recno, length_words = struct.unpack_from(">ii", buf, pos)
        pos += 8
        content_end = pos + length_words * 2
        if content_end > n:
            raise ValueError(f"{path}: truncated record at {pos}")
        (shape_type,) = struct.unpack_from("<i", buf, pos)
        if shape_type == 0:
            out.append(None)
        elif shape_type in _SHP_POLYGON_TYPES:
            out.append(_read_polygon(buf, pos + 4))
        else:
            raise ValueError(
                f"{path}: unsupported shape type {shape_type} "
                "(only Polygon/Null)")
        pos = content_end
    return out


def _read_polygon(buf: bytes, pos: int) -> list[np.ndarray]:
    # bbox (4 doubles) skipped
    nparts, npoints = struct.unpack_from("<ii", buf, pos + 32)
    pos += 40
    parts = np.frombuffer(buf, dtype="<i4", count=nparts, offset=pos)
    pos += 4 * nparts
    pts = np.frombuffer(buf, dtype="<f8", count=npoints * 2,
                        offset=pos).reshape(npoints, 2)
    bounds = np.concatenate([parts, [npoints]])
    return [pts[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)]


def write_shp(path: str, ring_lists: list[list[np.ndarray]]) -> None:
    """Minimal Polygon (type 5) writer — fixture/round-trip support and the
    K1 shapefile sink's file form (exposm/writer.py:14-29)."""
    records = []
    allpts = []
    for i, rings in enumerate(ring_lists):
        parts = []
        off = 0
        for r in rings:
            parts.append(off)
            off += len(r)
        pts = (np.vstack(rings) if rings
               else np.empty((0, 2), dtype=np.float64))
        allpts.append(pts)
        bbox = (pts[:, 0].min(), pts[:, 1].min(),
                pts[:, 0].max(), pts[:, 1].max()) if len(pts) else (0,) * 4
        content = (struct.pack("<i", 5) + struct.pack("<4d", *bbox)
                   + struct.pack("<ii", len(parts), len(pts))
                   + np.asarray(parts, dtype="<i4").tobytes()
                   + pts.astype("<f8").tobytes())
        records.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
    body = b"".join(records)
    every = (np.vstack(allpts) if any(len(p) for p in allpts)
             else np.zeros((1, 2)))
    header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0,
                         (100 + len(body)) // 2)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<4d", every[:, 0].min(), every[:, 1].min(),
                          every[:, 0].max(), every[:, 1].max())
    header += struct.pack("<4d", 0, 0, 0, 0)  # z/m ranges
    with open(path, "wb") as f:
        f.write(header + body)


# ---------------------------------------------------------------------------
# .dbf
# ---------------------------------------------------------------------------

def read_dbf(path: str) -> pa.Table:
    """dBASE III attribute table -> Arrow (C -> string, N/F -> int64 or
    float64 by decimal count, L -> bool, else string)."""
    with open(path, "rb") as f:
        buf = f.read()
    nrec, hsize, rsize = struct.unpack_from("<IHH", buf, 4)
    fields = []
    pos = 32
    while pos < hsize - 1 and buf[pos] != 0x0D:
        raw = buf[pos:pos + 32]
        name = raw[:11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(raw[11])
        flen = raw[16]
        fdec = raw[17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    cols: dict[str, list] = {name: [] for name, *_ in fields}
    for i in range(nrec):
        rpos = hsize + i * rsize
        rec = buf[rpos:rpos + rsize]
        if not rec or rec[0:1] == b"*":  # deleted
            continue
        off = 1
        for name, ftype, flen, fdec in fields:
            rawv = rec[off:off + flen].decode("latin-1").strip()
            off += flen
            if ftype in ("N", "F"):
                if rawv == "":
                    cols[name].append(None)
                elif ftype == "N" and fdec == 0 and "." not in rawv:
                    cols[name].append(int(rawv))
                else:
                    cols[name].append(float(rawv))
            elif ftype == "L":
                cols[name].append(rawv.upper() in ("T", "Y")
                                  if rawv else None)
            else:
                cols[name].append(rawv if rawv != "" else None)
    arrays = {}
    for name, ftype, flen, fdec in fields:
        vals = cols[name]
        if ftype in ("N", "F"):
            typ = (pa.int64() if ftype == "N" and fdec == 0
                   and all(isinstance(v, int) for v in vals if v is not None)
                   else pa.float64())
            arrays[name] = pa.array(vals, typ)
        elif ftype == "L":
            arrays[name] = pa.array(vals, pa.bool_())
        else:
            arrays[name] = pa.array(vals, pa.string())
    return pa.table(arrays)


def write_dbf(path: str, table: pa.Table, *, width: int = 64) -> None:
    """Minimal dBASE III writer: every column as a C (string) field."""
    names = table.column_names
    nrec = table.num_rows
    hsize = 32 + 32 * len(names) + 1
    rsize = 1 + width * len(names)
    header = struct.pack("<B3BIHH20x", 3, 25, 1, 1, nrec, hsize, rsize)
    descs = []
    for name in names:
        nm = name.encode("latin-1")[:11]
        descs.append(nm + b"\x00" * (11 - len(nm)) + b"C"
                     + b"\x00" * 4 + bytes([width, 0]) + b"\x00" * 14)
    with open(path, "wb") as f:
        f.write(header + b"".join(descs) + b"\x0D")
        for i in range(nrec):
            rec = [b" "]
            for name in names:
                v = table[name][i].as_py()
                s = ("" if v is None else str(v)).encode("latin-1",
                                                         "replace")[:width]
                rec.append(s + b" " * (width - len(s)))
            f.write(b"".join(rec))
        f.write(b"\x1a")


# ---------------------------------------------------------------------------
# combined readers
# ---------------------------------------------------------------------------

def read_shapefile(base: str) -> pa.Table:
    """``base`` with or without .shp extension -> Arrow table of the .dbf
    attributes + ``geom_wkb`` (MultiPolygon WKB; Null shapes -> null)."""
    if base.endswith(".shp"):
        base = base[:-4]
    shapes = read_shp(base + ".shp")
    attrs = read_dbf(base + ".dbf")
    if attrs.num_rows != len(shapes):
        raise ValueError(
            f"{base}: .dbf has {attrs.num_rows} rows, .shp {len(shapes)}")
    geom = pa.array(
        [wkbmod.rings_to_wkb(r) if r is not None else None for r in shapes],
        pa.binary())
    return attrs.append_column("geom_wkb", geom)


def write_shapefile(base: str, table: pa.Table,
                    geom_col: str = "geom_wkb") -> None:
    """K1 file-form writer: .shp (Polygon) + .dbf (attributes as strings)."""
    if base.endswith(".shp"):
        base = base[:-4]
    rings = [wkbmod.wkb_to_rings(b.as_py()) for b in table[geom_col]]
    write_shp(base + ".shp", rings)
    write_dbf(base + ".dbf", table.drop_columns([geom_col]))


def extract_gadm_archive(zip_path: str) -> list[str]:
    """Unzip a GADM archive to a tempdir and return the sorted .shp paths
    (one per admin level) — extract_gadm.py:32-40 semantics."""
    tmp = tempfile.mkdtemp(suffix="_gadm", dir="/tmp")
    with zipfile.ZipFile(zip_path, "r") as z:
        z.extractall(tmp)
    return sorted(glob.glob(os.path.join(tmp, "*.shp")))


def gadm_tables_from_archive(zip_path: str) -> dict[int, pa.Table]:
    """GADM zip -> per-level tables (pcode, name_en, geom_wkb), the
    extract_gadm.py field mapping (ADMx_PCODE / ADMx_EN, :74-77,132-135)
    normalized to the gadm pipeline's input schema."""
    out: dict[int, pa.Table] = {}
    for lvl, shp in enumerate(extract_gadm_archive(zip_path)):
        t = read_shapefile(shp)
        pcode_col = f"ADM{lvl}_PCODE"
        name_col = f"ADM{lvl}_EN"
        if pcode_col not in t.column_names:
            raise ValueError(f"{shp}: missing field {pcode_col}")
        out[lvl] = pa.table({
            "pcode": t[pcode_col],
            "name_en": t[name_col],
            "geom_wkb": t["geom_wkb"],
        })
    return out


def read_geojson(path: str) -> pa.Table:
    """GeoJSON FeatureCollection -> Arrow table: every property as a string
    column (union of keys, missing -> null) + ``geom_wkb`` MultiPolygon
    (Polygon promoted per M9 ForceToMultiPolygon, extract_geojson.py:59)."""
    with open(path) as f:
        doc = json.load(f)
    feats = doc.get("features", [])
    keys: list[str] = []
    for ft in feats:
        for k in (ft.get("properties") or {}):
            if k not in keys:
                keys.append(k)
    cols: dict[str, list] = {k: [] for k in keys}
    geoms: list[bytes | None] = []
    for ft in feats:
        props = ft.get("properties") or {}
        for k in keys:
            v = props.get(k)
            cols[k].append(None if v is None else str(v))
        geoms.append(_geojson_geom_to_wkb(ft.get("geometry")))
    arrays = {k: pa.array(cols[k], pa.string()) for k in keys}
    arrays["geom_wkb"] = pa.array(geoms, pa.binary())
    return pa.table(arrays)


def _geojson_geom_to_wkb(geom: dict | None) -> bytes | None:
    if geom is None:
        return None
    gtype = geom.get("type")
    coords = geom.get("coordinates")
    rings: list[np.ndarray] = []
    if gtype == "Polygon":
        polys = [coords]
    elif gtype == "MultiPolygon":
        polys = coords
    else:
        return None
    for poly in polys:
        for ring in poly:
            rings.append(np.asarray(ring, dtype=np.float64)[:, :2])
    return wkbmod.rings_to_wkb(rings)
