"""Pure-python/numpy PNG codec + WAV decode — REAL media codecs for the
multimodal stages (no pillow/ffmpeg in this environment, but PNG is just
zlib + per-row filters, and stdlib ``wave`` reads RIFF/WAVE).

Decoder: 8-bit, non-interlaced PNGs of color types 0 (grey), 2 (RGB),
3 (palette, expanded via PLTE/tRNS), 4 (grey+alpha), 6 (RGBA) — the
whole of what common web encoders emit for icons/thumbnails; every
filter type (None/Sub/Up/Average/Paeth) per the PNG 1.2 spec
(https://www.w3.org/TR/PNG/ §9). Validated in tests against real files
produced by external encoders (/usr/share gitweb + sphinx icons cover
ctypes 0, 3 and 6).

Encoder: filter-0 rows, one zlib IDAT, ctype 0/2/6 by channel count —
minimal but spec-conformant (any reader decodes it; round-trip pinned).

Scale note: decode runs inside the MediaDecode actor pool over SMALL
batches (binary payloads dominate row size); rows are unfiltered with
vectorized numpy where the filter allows (None/Up fully, Sub via
modular cumsum) and a per-pixel loop only for Average/Paeth rows —
correctness first; icon-sized web images make this negligible next to
the zlib inflate.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return len(data) > 8 and data[:8] == PNG_SIG


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        yield typ, data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct scanlines: raw is height*(1+stride) filter-prefixed
    bytes; returns (height, stride) uint8."""
    raw = raw.reshape(height, 1 + stride)
    ftypes = raw[:, 0]
    rows = raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(ftypes[y])
        cur = rows[y]
        if ft == 0:                                   # None
            rec = cur.copy()
        elif ft == 2:                                 # Up
            rec = cur + prev                          # uint8 wraps mod 256
        elif ft == 1:                                 # Sub — modular cumsum
            rec = np.add.accumulate(
                cur.reshape(-1, bpp), axis=0, dtype=np.uint8).reshape(-1)
        elif ft == 3:                                 # Average
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:                                 # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (int(cur[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8. Palette images expand to RGB (or RGBA
    when a tRNS chunk is present); 8-bit non-interlaced only."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    ctype = depth = interlace = None
    plte = trns = None
    idat = []
    for typ, body in _chunks(data):
        if typ == b"IHDR":
            width, height, depth, ctype, _, _, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif typ == b"IDAT":
            idat.append(body)
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth}/interlace={interlace} unsupported "
            "(8-bit non-interlaced only)")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype} unsupported")
    ch = _CHANNELS[ctype]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG data length mismatch")
    img = _unfilter(raw, height, stride, ch).reshape(height, width, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        idx = img[:, :, 0]
        rgb = plte[idx]                               # (H, W, 3)
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[:len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (ctype 0/2/6 by channels,
    filter 0, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# WAV (RIFF) decode via stdlib wave
# ---------------------------------------------------------------------------

def is_wav(data: bytes) -> bool:
    return len(data) > 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_samples, n_channels) int16 array, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("16-bit PCM WAV only")
        n = f.getnframes()
        arr = np.frombuffer(f.readframes(n), dtype="<i2")
        return arr.reshape(n, f.getnchannels()), f.getframerate()


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, ch) int16 -> WAV bytes (16-bit PCM)."""
    import io
    import wave

    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()
