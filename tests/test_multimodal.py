"""Multimodal stage plumbing tests (schema, actor decode, frame sampling)."""

import numpy as np
import pytest

from posm_ray.stages import multimodal as mm


def test_payload_roundtrip():
    p = mm.make_payload(7)
    assert p[:4] == mm.MAGIC
    _, mt, w, h, nf, sr = mm.parse_header(p)
    assert mm.MEDIA_TYPES[mt] == "audio"  # 7 % 3 == 1
    assert sr == 16000
    assert p == mm.make_payload(7)  # deterministic


def test_decode_pipeline(ray_session, sf_smoke):
    ds = mm.media_table(sf_smoke)
    out = mm.decoded_media(ds).to_pandas()
    assert len(out) == 500
    assert out["decoded_ok"].all()
    assert set(out.columns) == {"doc_id", "media_type", "decoded_ok", "width",
                                "height", "n_frames", "sample_rate", "mean_byte"}
    img = out[out["media_type"] == "image"]
    assert (img["n_frames"] == 1).all()
    # payload column dropped by the decode stage
    assert "payload" not in out.columns


def test_decode_malformed_row(ray_session):
    import ray.data as rd
    import pyarrow as pa

    bad = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "media_type": pa.array(["image", "image"]),
        "payload": pa.array([b"nope", mm.make_payload(2)], pa.binary()),
    })
    out = mm.decoded_media(rd.from_arrow(bad)).to_pandas().sort_values("doc_id")
    assert list(out["decoded_ok"]) == [False, True]


def test_require_real_codec_raises():
    with pytest.raises(NotImplementedError):
        mm.MediaDecode(require_real_codec=True)


def test_frame_sampling(ray_session, sf_smoke):
    ds = mm.media_table(sf_smoke)
    frames = mm.frame_sample(ds, every_k=4).to_pandas()
    assert (frames["media_type"] == "video").all()
    assert (frames["frame_index"] % 4 == 0).all()
    # every video doc appears
    vids = {i for i in range(500) if i % 3 == 2}
    assert set(frames["doc_id"]) == vids


def test_media_embeddings(ray_session, sf_smoke):
    ds = mm.media_table(sf_smoke)
    emb = mm.media_embeddings(ds, dim=16).to_pandas()
    assert len(emb) == 500
    mat = np.asarray(list(emb["embedding"]))
    assert mat.shape == (500, 16)
    # deterministic: same doc -> same vector across runs
    emb2 = mm.media_embeddings(mm.media_table(sf_smoke), dim=16).to_pandas()
    m1 = dict(zip(emb["doc_id"], emb["embedding"]))
    m2 = dict(zip(emb2["doc_id"], emb2["embedding"]))
    assert all(np.array_equal(m1[k], m2[k]) for k in m1)


# ---------------------------------------------------------------------------
# REAL codecs (round 5): pure-python PNG + stdlib WAV
# ---------------------------------------------------------------------------

_SYSTEM_PNGS = [
    # external-encoder files: ctype 3 (palette), 6 (RGBA), 0 (grey)
    ("/usr/share/gitweb/static/git-logo.png", (27, 72, 3)),
    ("/usr/share/doc/python3/_static/file.png", (16, 16, 4)),
    ("/usr/share/doc/python3/_static/minus.png", (11, 11, 1)),
]


class TestRealPngCodec:
    def test_decodes_external_encoder_files(self):
        """The decoder reads REAL PNGs produced by encoders we don't
        control (palette, RGBA, greyscale), and our encoder's output of
        the decoded pixels round-trips bit-identically."""
        import os

        from posm_ray.functions import png

        for path, shape in _SYSTEM_PNGS:
            if not os.path.exists(path):
                pytest.skip(f"{path} absent")
            img = png.decode_png(open(path, "rb").read())
            assert img.shape == shape and img.dtype == np.uint8
            assert np.array_equal(png.decode_png(png.encode_png(img)), img)

    def test_all_filter_types_invert(self):
        """Hand-filter rows with every PNG filter (None/Sub/Up/Average/
        Paeth per the spec) and require the decoder to invert them."""
        import struct
        import zlib

        from posm_ray.functions import png

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
        h, w, ch = img.shape
        stride = w * ch
        flat = img.reshape(h, stride).astype(np.int32)
        rows = []
        for y, ft in enumerate([0, 1, 2, 3, 4, 1, 4]):
            cur = flat[y]
            prev = flat[y - 1] if y else np.zeros(stride, np.int32)
            f = np.empty(stride, np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    pp = a + b - c
                    pa_, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else \
                        (b if pb <= pc else c)
                f[x] = (cur[x] - pred) & 0xFF
            rows.append(np.concatenate([[ft], f]))
        raw = np.concatenate(rows).astype(np.uint8)

        def chunk(t, b):
            return (struct.pack(">I", len(b)) + t + b
                    + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

        data = (png.PNG_SIG
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw.tobytes()))
                + chunk(b"IEND", b""))
        assert np.array_equal(png.decode_png(data), img)

    def test_wav_roundtrip(self):
        from posm_ray.functions import png

        s = (np.sin(np.arange(800) / 10.0) * 12000).astype(np.int16)
        arr, rate = png.decode_wav(png.encode_wav(s, 16000))
        assert rate == 16000 and np.array_equal(arr[:, 0], s)


class TestRealMediaStages:
    def test_real_decode_matches_closed_form(self, ray_session, sf_smoke):
        """The actor pool decodes genuine PNG/WAV bytes; sums must equal
        the gradient closed form (the oracle contract, pinned locally)."""
        out = mm.real_decoded_media(mm.real_media_table(sf_smoke)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(out) > 0
        for _, r in out.head(20).iterrows():
            d = int(r["doc_id"])
            if r["kind"] == "png":
                w, h = 8 + d % 8, 8 + d % 5
                want = int(((np.arange(w * h, dtype=np.int64) + d) % 256)
                           .sum())
                assert (r["width"], r["height"]) == (w, h)
            else:
                n = 64 + (d % 32) * 16
                want = int(np.abs((np.arange(n, dtype=np.int64) * (d + 1))
                                  % 4096 - 2048).sum())
                assert (r["n_samples"], r["sample_rate"]) == (n, 16000)
            assert int(r["pixel_sum"]) == want

    def test_real_resize_nn_rule(self, ray_session, sf_smoke):
        """Resized dims obey the integer NN rule and pixel sums match a
        local numpy rebuild (encode -> decode -> subsample -> re-encode)."""
        from posm_ray.functions import png as pngmod

        out = mm.real_resized_media(mm.real_media_table(sf_smoke)) \
            .to_pandas()
        pngs = out[out["kind"] == "png"].head(20)
        assert len(pngs) > 0
        for _, r in pngs.iterrows():
            d = int(r["doc_id"])
            w, h = 8 + d % 8, 8 + d % 5
            img = ((np.arange(w * h, dtype=np.int64) + d) % 256) \
                .astype(np.uint8).reshape(h, w)
            mx = max(w, h)
            if mx > 8:
                nw, nh = max(1, w * 8 // mx), max(1, h * 8 // mx)
                xs = (np.arange(nw, dtype=np.int64) * w) // nw
                ys = (np.arange(nh, dtype=np.int64) * h) // nh
                img = img[ys][:, xs]
            rt = pngmod.decode_png(pngmod.encode_png(img))
            assert (int(r["width"]), int(r["height"])) == \
                (rt.shape[1], rt.shape[0])
            assert int(r["pixel_sum"]) == int(rt.astype(np.int64).sum())
