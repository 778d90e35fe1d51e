"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by actor-pool map_batches stages.

The graft mandate: the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is REAL and tested; the codec itself is stubbed
because no image/audio libraries exist in this environment. Each decode
actor probes for the real library in ``__init__`` (once per actor — the
model-load slot); absent, it uses a deterministic fake codec over a
self-describing payload header, and ``require_real_codec=True`` raises
NotImplementedError to mark the boundary explicitly.

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
