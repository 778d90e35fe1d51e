"""Id / attribute normalizers — posm's per-record maps rebuilt as vectorized
batch kernels (SURVEY.md §2.3 M1-M3, M10).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def prepare_osm_id(layer: pa.Array, osm_id: pa.Array,
                   osm_way_id: pa.Array) -> pa.Array:
    """Layer-dependent id prefixing (reference exposm/utils.py:13-35):

      points -> N{osm_id}; lines -> W{osm_id};
      multipolygons -> W{osm_way_id} if ONLY the way id is set,
      R{osm_id} if ONLY osm_id is set, else null (discard) — the
      reference's else-branch rejects rows with BOTH ids set as well as
      rows with neither ("Can't detect osm_id, discarding");
      multilinestrings / other_relations -> R{osm_id};
      unknown layer -> null (discard).

    Vectorized with pyarrow.compute; null result == reference's None.
    """
    layer_np = np.asarray(layer)
    osm = pc.cast(osm_id, pa.string())
    way = pc.cast(osm_way_id, pa.string())
    has_osm = pc.is_valid(osm).to_numpy(zero_copy_only=False)
    has_way = pc.is_valid(way).to_numpy(zero_copy_only=False)

    def prefixed(prefix: str, col: pa.Array) -> pa.Array:
        return pc.binary_join_element_wise(pa.scalar(prefix), col, "")

    n_pref = prefixed("N", osm)
    w_pref = prefixed("W", osm)
    w_way = prefixed("W", way)
    r_pref = prefixed("R", osm)

    out = []
    n_np, w_np, ww_np, r_np = (a.to_pylist() for a in (n_pref, w_pref, w_way, r_pref))
    for i, lyr in enumerate(layer_np):
        if lyr == "points":
            out.append(n_np[i])
        elif lyr == "lines":
            out.append(w_np[i])
        elif lyr == "multipolygons":
            if has_osm[i] and not has_way[i]:
                out.append(r_np[i])
            elif has_way[i] and not has_osm[i]:
                out.append(ww_np[i])
            else:
                out.append(None)
        elif lyr in ("multilinestrings", "other_relations"):
            out.append(r_np[i])
        else:
            out.append(None)
    return pa.array(out, pa.string())


def coalesce_name(name_en: pa.Array, name: pa.Array) -> pa.Array:
    """``name_en or name`` (reference extract.py:99-107); rows where both are
    null are later skipped (the reference prints a diagnostic and drops)."""
    return pc.coalesce(name_en, name)


def iso_upper(iso: pa.Array) -> pa.Array:
    """iso3166 uppercased when present (reference extract.py:110-112)."""
    return pc.utf8_upper(iso)


def decode_utf8_escapes(values: list[str | None]) -> list[str | None]:
    """Un-escape doubly-encoded UTF-8 property strings (reference
    extract_overpass.py:41-52 uses ast.literal_eval on b"..." literals; we
    decode backslash-escape sequences equivalently, errors -> passthrough)."""
    out = []
    for v in values:
        if v is None:
            out.append(None)
            continue
        try:
            out.append(v.encode("latin-1", "backslashreplace")
                        .decode("unicode_escape")
                        .encode("latin-1")
                        .decode("utf-8"))
        except (UnicodeDecodeError, UnicodeEncodeError):
            out.append(v)
    return out
