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
