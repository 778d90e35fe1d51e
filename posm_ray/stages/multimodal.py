"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by actor-pool map_batches stages.

TWO codec tiers (round 5):

* **REAL codecs** — PNG (pure-python/numpy zlib+filter codec,
  ``functions/png.py``, validated against external-encoder files) and
  16-bit PCM WAV (stdlib ``wave``). ``real_media_table`` synthesizes
  genuine PNG/WAV payloads; ``RealMediaDecode`` / the PNG branch of
  ``MediaResize`` inflate + unfilter + (re)encode actual bytes. The
  driver queries ``media_real_decode`` / ``media_real_resize`` are
  hash-checked: the oracle knows the encoded gradient in closed form,
  so the Ray side only matches if the zlib/filter decode is correct.
* **Deterministic fake** — the PMM1 header format below, kept for the
  formats no library here can read (JPEG/MP4/...). Each decode actor
  resolves its codec in ``__init__`` (once per actor — the model-load
  slot); ``require_real_codec=True`` raises NotImplementedError only
  for those genuinely-unavailable formats.

Payload format (synthesized deterministically from doc_id):
  magic(4) | media_type(1) | width(u16) | height(u16) | n_frames(u16) |
  sample_rate(u32) | body bytes (seeded xorshift stream)

Scale notes: payloads dominate row size, so stages run with SMALL
batch_size (64) and drop the binary column as soon as the derived
features are computed (the html-projection rule, SURVEY.md §7.5.8).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..util import default_pool

MAGIC = b"PMM1"
MEDIA_TYPES = {0: "image", 1: "audio", 2: "video"}
_HEADER_FMT = "<4sBHHHI"  # plain string: struct.Struct isn't picklable
HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def parse_header(p: bytes) -> tuple:
    """(magic, media_type, width, height, n_frames, sample_rate)."""
    return struct.unpack_from(_HEADER_FMT, p)


def _body(seed: int, n: int) -> np.ndarray:
    """Deterministic byte stream (xorshift64) — the fake media body."""
    out = np.empty(n, dtype=np.uint8)
    x = np.uint64(seed * 2654435761 % (1 << 63) or 1)
    for i in range(n):
        x ^= x << np.uint64(13)
        x ^= x >> np.uint64(7)
        x ^= x << np.uint64(17)
        out[i] = int(x) & 0xFF
    return out


def make_payload(doc_id: int) -> bytes:
    """Deterministic media payload for a doc: type cycles image/audio/video;
    dims and body derive from doc_id."""
    mt = doc_id % 3
    width = 16 + (doc_id % 8) * 16
    height = 16 + (doc_id % 5) * 16
    n_frames = 1 if mt == 0 else (8 + doc_id % 24)
    sample_rate = 16000 if mt == 1 else 0
    body_len = 256 + (doc_id % 7) * 64
    header = struct.pack(_HEADER_FMT, MAGIC, mt, width, height, n_frames, sample_rate)
    return header + _body(doc_id, body_len).tobytes()


def media_table(sf_dir: str):
    """documents -> media Dataset (doc_id, media_type, payload) — the
    opaque-binary input layout."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids_ = batch.column("doc_id").to_pylist()
        payloads = [make_payload(int(i)) for i in ids_]
        mtypes = [MEDIA_TYPES[int(i) % 3] for i in ids_]
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_type": pa.array(mtypes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# REAL-codec table + decode (PNG / WAV)
# ---------------------------------------------------------------------------

def _png_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 8, 8 + doc_id % 5  # (W, H), <= 15 x 12


def _wav_len(doc_id: int) -> int:
    return 64 + (doc_id % 32) * 16


def make_real_payload(doc_id: int) -> tuple[str, bytes]:
    """(kind, payload): even doc_ids -> a REAL PNG of the gradient
    pixel(x, y) = (x + y*W + doc_id) % 256 (grey); odd -> a REAL 16-bit
    PCM WAV with sample[i] = ((i*(doc_id+1)) % 4096) - 2048 at 16 kHz.
    Both are integer closed forms, so the decode oracle can compute the
    expected pixel/sample sums in SQL without ever touching bytes."""
    from ..functions import png as pngmod

    if doc_id % 2 == 0:
        w, h = _png_dims(doc_id)
        img = ((np.arange(w * h, dtype=np.int64) + doc_id) % 256) \
            .astype(np.uint8).reshape(h, w)
        return "png", pngmod.encode_png(img)
    n = _wav_len(doc_id)
    s = ((np.arange(n, dtype=np.int64) * (doc_id + 1)) % 4096 - 2048) \
        .astype(np.int16)
    return "wav", pngmod.encode_wav(s, 16000)


def real_media_table(sf_dir: str):
    """documents -> (doc_id, kind, payload) with REAL PNG/WAV bytes."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids_ = batch.column("doc_id").to_pylist()
        rows = [make_real_payload(int(i)) for i in ids_]
        return pa.table({
            "doc_id": batch["doc_id"],
            "kind": pa.array([k for k, _ in rows], pa.string()),
            "payload": pa.array([p for _, p in rows], pa.binary()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=64)


class RealMediaDecode:
    """Actor-pool decode of REAL formats: PNG -> (width, height,
    pixel_sum); WAV -> (n_samples, sample_rate, pixel_sum = sum |amp|).
    All sums are BIGINT so the closed-form SQL twin is bit-exact. Raises
    on any byte-level corruption — decode errors must surface, not
    silently zero (DiscardFeatureWriter would route them in a pipeline)."""

    def __init__(self):
        from ..functions import png as pngmod

        self.png = pngmod  # codec resolved once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        width = np.zeros(n, np.int64)
        height = np.zeros(n, np.int64)
        nsamp = np.zeros(n, np.int64)
        rate = np.zeros(n, np.int64)
        psum = np.zeros(n, np.int64)
        for i, p in enumerate(batch.column("payload").to_pylist()):
            if self.png.is_png(p):
                img = self.png.decode_png(p)
                height[i], width[i] = img.shape[0], img.shape[1]
                psum[i] = int(img.astype(np.int64).sum())
            elif self.png.is_wav(p):
                arr, r = self.png.decode_wav(p)
                nsamp[i], rate[i] = arr.shape[0], r
                psum[i] = int(np.abs(arr.astype(np.int64)).sum())
            else:
                raise ValueError("unknown real-media payload")
        return pa.table({
            "doc_id": batch["doc_id"],
            "kind": batch["kind"],
            "width": pa.array(width),
            "height": pa.array(height),
            "n_samples": pa.array(nsamp),
            "sample_rate": pa.array(rate),
            "pixel_sum": pa.array(psum),
        })


RESIZE_CAP = 8  # real-resize target box (integer-exact rule below)


class RealMediaResize:
    """Actor-pool REAL resize: PNG payloads decode -> nearest-neighbor
    downsample into a ``cap`` x ``cap`` box -> RE-ENCODE -> re-decode (the
    encoder is inside the verified loop, not just the decoder); WAV rows
    pass through with their decode features. The NN rule is integer-only
    (no float scale factor, so the SQL twin replays it exactly):

        mx = max(w, h); if mx <= cap: unchanged
        else nw = max(1, w*cap // mx), nh = max(1, h*cap // mx)
        src column of xx = xx*w // nw, src row of yy = yy*h // nh
    """

    def __init__(self, cap: int = RESIZE_CAP):
        from ..functions import png as pngmod

        self.png = pngmod
        self.cap = cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        width = np.zeros(n, np.int64)
        height = np.zeros(n, np.int64)
        psum = np.zeros(n, np.int64)
        for i, p in enumerate(batch.column("payload").to_pylist()):
            if self.png.is_png(p):
                img = self.png.decode_png(p)
                h, w = img.shape[0], img.shape[1]
                mx = max(w, h)
                if mx > self.cap:
                    nw = max(1, w * self.cap // mx)
                    nh = max(1, h * self.cap // mx)
                    xs = (np.arange(nw, dtype=np.int64) * w) // nw
                    ys = (np.arange(nh, dtype=np.int64) * h) // nh
                    img = img[ys][:, xs]
                rt = self.png.decode_png(self.png.encode_png(img))
                height[i], width[i] = rt.shape[0], rt.shape[1]
                psum[i] = int(rt.astype(np.int64).sum())
            elif self.png.is_wav(p):
                arr, _ = self.png.decode_wav(p)
                psum[i] = int(np.abs(arr.astype(np.int64)).sum())
            else:
                raise ValueError("unknown real-media payload")
        return pa.table({
            "doc_id": batch["doc_id"],
            "kind": batch["kind"],
            "width": pa.array(width),
            "height": pa.array(height),
            "pixel_sum": pa.array(psum),
        })


class MediaDecode:
    """Actor-pool decode stage. ``__init__`` (once per actor) resolves the
    codec: real library if importable, else the deterministic fake; the
    real-codec path is the documented NotImplementedError stub."""

    def __init__(self, require_real_codec: bool = False):
        self.real = None
        try:  # pragma: no cover - PIL absent in this environment
            import PIL.Image  # noqa: F401

            self.real = "pillow"
        except ImportError:
            if require_real_codec:
                raise NotImplementedError(
                    "real media codecs (pillow/ffmpeg) are not available in "
                    "this environment; deterministic fake codec only")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        width = np.empty(len(payloads), np.int32)
        height = np.empty(len(payloads), np.int32)
        frames = np.empty(len(payloads), np.int32)
        rate = np.empty(len(payloads), np.int32)
        mean_byte = np.empty(len(payloads), np.float64)
        ok = np.ones(len(payloads), bool)
        for i, p in enumerate(payloads):
            if p is None or len(p) < HEADER_SIZE or p[:4] != MAGIC:
                ok[i] = False
                width[i] = height[i] = frames[i] = rate[i] = 0
                mean_byte[i] = 0.0
                continue
            _, mt, w, h, nf, sr = parse_header(p)
            width[i], height[i], frames[i], rate[i] = w, h, nf, sr
            body = np.frombuffer(p, dtype=np.uint8, offset=HEADER_SIZE)
            mean_byte[i] = float(body.mean()) if len(body) else 0.0
        # payload dropped here — only metadata + features flow on
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "decoded_ok": pa.array(ok),
            "width": pa.array(width),
            "height": pa.array(height),
            "n_frames": pa.array(frames),
            "sample_rate": pa.array(rate),
            "mean_byte": pa.array(mean_byte),
        })


class MediaEmbed:
    """Feature-extraction actor (the batched-model-inference slot): payload
    -> fixed-dim vector. Fake model = seeded INTEGER random projection of
    the byte histogram, built once per actor in __init__.  Integer weights
    (randint [-8, 8]) keep hist @ proj exact in int64, so the embedding is
    order-independent and the DuckDB oracle twin can replicate it
    bit-for-bit (sum of weights over the regenerated xorshift body)."""

    def __init__(self, dim: int = 16, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.proj = rng.randint(-8, 9, size=(256, dim)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        vecs = np.zeros((len(payloads), self.proj.shape[1]), dtype=np.int64)
        for i, p in enumerate(payloads):
            if not p or len(p) <= HEADER_SIZE:
                continue
            body = np.frombuffer(p, dtype=np.uint8, offset=HEADER_SIZE)
            hist = np.bincount(body, minlength=256).astype(np.int64)
            vecs[i] = hist @ self.proj
        return pa.table({
            "doc_id": batch["doc_id"],
            "embedding": pa.array(list(vecs), pa.list_(pa.int64())),
        })


def media_embed_weights(dim: int = 16, seed: int = 42) -> np.ndarray:
    """The (256, dim) integer weight table MediaEmbed uses — exported so
    the oracle SQL builder can inline the identical values."""
    rng = np.random.RandomState(seed)
    return rng.randint(-8, 9, size=(256, dim)).astype(np.int64)


def frame_sample(ds, every_k: int = 4):
    """Video frame sampling: one output row per sampled frame index
    (flat_map-shaped explode done batch-wise)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids_, mts, frames = [], [], []
        for r in batch.select(["doc_id", "media_type", "payload"]).to_pylist():
            if r["media_type"] != "video" or not r["payload"]:
                continue
            _, _, _, _, nf, _ = parse_header(r["payload"])
            for fi in range(0, nf, every_k):
                ids_.append(r["doc_id"])
                mts.append(r["media_type"])
                frames.append(fi)
        return pa.table({
            "doc_id": pa.array(ids_, pa.int64()),
            "media_type": pa.array(mts, pa.string()),
            "frame_index": pa.array(frames, pa.int32()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=64)


def real_decoded_media(ds, *, concurrency=None, batch_size: int = 64):
    """real media Dataset -> REAL-codec decode actor pool."""
    return ds.map_batches(
        RealMediaDecode, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency if concurrency is not None else default_pool())


def real_resized_media(ds, *, cap: int = RESIZE_CAP, concurrency=None,
                       batch_size: int = 64):
    """real media Dataset -> REAL resize (decode -> NN -> re-encode)."""
    return ds.map_batches(
        RealMediaResize, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True, fn_constructor_kwargs={"cap": cap},
        concurrency=concurrency if concurrency is not None else default_pool())


def decoded_media(ds, *, concurrency=None, batch_size: int = 64,
                  require_real_codec: bool = False):
    """media Dataset -> decode actor pool (small batches: binary payloads)."""
    return ds.map_batches(
        MediaDecode, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={"require_real_codec": require_real_codec},
        concurrency=concurrency if concurrency is not None else default_pool())


def media_embeddings(ds, *, concurrency=None, batch_size: int = 64, dim: int = 16):
    return ds.map_batches(
        MediaEmbed, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True, fn_constructor_kwargs={"dim": dim},
        concurrency=concurrency if concurrency is not None else default_pool())


class MediaResize:
    """Resize stage (actor pool): image/video payloads rescaled to fit
    ``(max_w, max_h)`` preserving aspect ratio (integer floor); audio passes
    through. Real resampling is stubbed like decode — the fake codec
    rewrites the header with the new dims and subsamples the body stride-k;
    output stays an opaque payload so downstream stages are agnostic."""

    def __init__(self, max_w: int = 64, max_h: int = 64,
                 require_real_codec: bool = False):
        self.max_w = max_w
        self.max_h = max_h
        if require_real_codec:
            raise NotImplementedError(
                "real resize (pillow/ffmpeg) unavailable; deterministic "
                "fake resize only")

    def _new_dims(self, w: int, h: int) -> tuple[int, int]:
        if w <= self.max_w and h <= self.max_h:
            return w, h
        scale = min(self.max_w / w, self.max_h / h)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload = []
        out_w = np.empty(batch.num_rows, np.int32)
        out_h = np.empty(batch.num_rows, np.int32)
        for i, p in enumerate(batch.column("payload").to_pylist()):
            if p is None or len(p) < HEADER_SIZE or p[:4] != MAGIC:
                out_payload.append(p)
                out_w[i] = out_h[i] = 0
                continue
            _, mt, w, h, nf, sr = parse_header(p)
            if mt == 1:  # audio: passthrough
                out_payload.append(p)
                out_w[i], out_h[i] = w, h
                continue
            nw, nh = self._new_dims(w, h)
            body = p[HEADER_SIZE:]
            stride = max(1, (w * h) // max(1, (nw * nh)))
            header = struct.pack(_HEADER_FMT, MAGIC, mt, nw, nh, nf, sr)
            out_payload.append(header + body[::stride])
            out_w[i], out_h[i] = nw, nh
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "payload": pa.array(out_payload, pa.binary()),
            "width": pa.array(out_w),
            "height": pa.array(out_h),
        })


def resized_media(ds, *, max_w: int = 64, max_h: int = 64, concurrency=None,
                  batch_size: int = 64):
    from ..util import default_pool

    return ds.map_batches(
        MediaResize, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
        concurrency=concurrency if concurrency is not None else default_pool())
