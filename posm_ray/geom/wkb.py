"""Minimal WKB (well-known binary) codec for Polygon / MultiPolygon.

The reference moves geometry as WKB everywhere (shapely.wkb.loads of
ogr ExportToWkb — extract.py:139, exposm/utils.py:58; sinks write WKB
MultiPolygon, exposm/writer.py:64,83). Our Arrow tables carry geometry as a
``binary`` column of little-endian ISO WKB; this module converts ring lists
(list of (n,2) float64 arrays) <-> WKB bytes with numpy, no GDAL.

Layout (little-endian): byte order (1) | geom type (4) | counts | doubles.
Types: 3 = Polygon, 6 = MultiPolygon. A MultiPolygon's parts each carry their
own shell+hole rings; we flatten all rings into one even-odd ring list on
decode (matching the PIP kernel's representation).
"""

from __future__ import annotations

import struct

import numpy as np

_POLYGON = 3
_MULTIPOLYGON = 6


def rings_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Encode a ring list as a WKB MultiPolygon with one part per ring.

    (Hole attribution is not preserved — the PIP kernel is even-odd so
    membership is identical; bbox/area consumers are unaffected.)
    """
    out = [struct.pack("<BII", 1, _MULTIPOLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8")
        out.append(struct.pack("<BII", 1, _POLYGON, 1))
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.tobytes())
    return b"".join(out)


def wkb_to_rings(buf: bytes) -> list[np.ndarray]:
    """Decode WKB Polygon or MultiPolygon into a flat ring list.

    Raises ValueError on malformed input (callers map that to the
    ``BONKERS!`` validity sentinel, exposm/utils.py:67-69).
    """
    rings: list[np.ndarray] = []
    pos = _read_geom(buf, 0, rings)
    if pos != len(buf):
        raise ValueError("trailing bytes in WKB")
    return rings


def _read_geom(buf: bytes, pos: int, rings: list[np.ndarray]) -> int:
    if pos + 5 > len(buf):
        raise ValueError("truncated WKB header")
    byte_order = buf[pos]
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(endian + "I", buf, pos + 1)
    pos += 5
    gtype = gtype & 0xFF  # strip SRID/Z flags
    if gtype == _POLYGON:
        (nrings,) = struct.unpack_from(endian + "I", buf, pos)
        pos += 4
        for _ in range(nrings):
            (npts,) = struct.unpack_from(endian + "I", buf, pos)
            pos += 4
            nbytes = npts * 16
            if pos + nbytes > len(buf):
                raise ValueError("truncated WKB ring")
            ring = np.frombuffer(buf, dtype=endian + "f8", count=npts * 2,
                                 offset=pos).reshape(npts, 2).copy()
            rings.append(ring)
            pos += nbytes
        return pos
    if gtype == _MULTIPOLYGON:
        (nparts,) = struct.unpack_from(endian + "I", buf, pos)
        pos += 4
        for _ in range(nparts):
            pos = _read_geom(buf, pos, rings)
        return pos
    raise ValueError(f"unsupported WKB geometry type {gtype}")
