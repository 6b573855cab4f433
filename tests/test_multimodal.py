"""Multimodal stages: metadata probe, resize, features, frame-sample stub."""

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_rs_ray.functions import raster as R
from deepseek_ocr_rs_ray.stages import multimodal as M


def _payload_batch():
    imgs = [R.render_text_image("HELLO", 3),
            R.render_text_image("WORLD\nAGAIN", 2)]
    payloads = [R.encode_payload(im, s, R.DEFAULT_MARGIN)
                for im, s in zip(imgs, (3, 2))]
    return pa.table({"url": pa.array(["u1", "u2"]),
                     "payload": pa.array(payloads, pa.binary())}), imgs


def test_decode_meta():
    batch, imgs = _payload_batch()
    out = M.ImageDecodeMeta()(batch)
    assert out.num_rows == 2
    assert out.column("width").to_pylist() == [imgs[0].shape[1], imgs[1].shape[1]]
    assert out.column("glyph_scale").to_pylist() == [3, 2]
    # junk payload skipped, not fatal
    bad = pa.table({"url": pa.array(["x"]), "payload": pa.array([b"junk"], pa.binary())})
    assert M.ImageDecodeMeta()(bad).num_rows == 0


def test_resize_stage_roundtrip():
    batch, imgs = _payload_batch()
    out = M.ImageResizeStage(thumb=32)(batch)
    assert out.num_rows == 2
    thumb, scale, margin = R.decode_payload(out.column("thumb").to_pylist()[0])
    assert thumb.shape == (32, 32, 3)
    assert scale == 3  # metadata carried through
    assert out.column("orig_width").to_pylist()[0] == imgs[0].shape[1]


def test_feature_stage_deterministic():
    batch, _ = _payload_batch()
    a = M.ImageFeatureStage()(batch)
    b = M.ImageFeatureStage()(batch)
    assert a.equals(b)
    vec = a.column("features").to_pylist()[0]
    assert len(vec) == M.FEATURE_GRID ** 2 + 1
    assert all(0.0 <= v <= 1.0 for v in vec)


def test_frame_sample_stub_and_fake():
    with pytest.raises(NotImplementedError):
        M.FrameSampleStage(codec="mp4")
    # deterministic fake: a 4-"frame" clip sampled with stride 2 → frames 0, 2
    clip = np.vstack([np.full((16, 8, 3), v, dtype=np.uint8)
                      for v in (0, 255, 128, 64)])
    payload = R.encode_payload(clip, 1, 0)
    batch = pa.table({"url": pa.array(["v1"]),
                      "payload": pa.array([payload], pa.binary())})
    out = M.FrameSampleStage(frame_h=16, stride=2)(batch)
    assert out.column("frame_index").to_pylist() == [0, 2]


def test_multimodal_pipelines(ray_session):
    from deepseek_ocr_rs_ray.pipelines import corpus as C
    sf = "/root/testdata/sf0.001"
    th = C.x_image_thumbnails(sf).to_pandas()
    assert len(th) > 0
    ft = C.x_image_features(sf).to_pandas()
    assert set(th["url"]) == set(ft["url"])
    fr = C.x_frame_samples(sf).to_pandas()
    assert len(fr) >= len(th)  # >=1 frame per payload
