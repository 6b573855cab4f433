"""Baseline JPEG codec (functions/jpeg.py): lossy round trips (PSNR +
bit-determinism, not pixel identity), grayscale decode, header probe,
fail-fast rejects, and multimodal sniff-dispatch integration."""

import struct

import numpy as np
import pytest

from deepseek_ocr_rs_ray.functions import jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse > 0 else float("inf")


def _structured(h=40, w=56):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(y * 4) % 256, (x * 3) % 256,
                     ((x + y) * 2) % 256], axis=2).astype(np.uint8)


@pytest.mark.parametrize("quality,min_psnr", [(50, 35.0), (85, 43.0),
                                              (95, 48.0)])
def test_round_trip_psnr(quality, min_psnr):
    img = _structured()
    data = jpeg.encode_jpeg(img, quality=quality)
    assert jpeg.is_jpeg(data)
    out = jpeg.decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) >= min_psnr


def test_flat_image_near_lossless():
    flat = np.full((17, 23, 3), 77, dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(flat, 85))
    assert int(np.abs(out.astype(int) - 77).max()) <= 1


def test_bit_determinism():
    img = _structured(24, 24)
    assert jpeg.encode_jpeg(img, 85) == jpeg.encode_jpeg(img, 85)
    data = jpeg.encode_jpeg(img, 85)
    assert (jpeg.decode_jpeg(data) == jpeg.decode_jpeg(data)).all()


def test_non_multiple_of_8_dims():
    rng = np.random.default_rng(9)
    for shape in [(1, 1, 3), (7, 9, 3), (8, 8, 3), (13, 26, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90))
        assert out.shape == img.shape


def test_meta_header_only():
    img = _structured(11, 29)
    m = jpeg.jpeg_meta(jpeg.encode_jpeg(img, 85))
    assert (m["width"], m["height"], m["components"]) == (29, 11, 3)
    assert m["progressive"] == 0 and m["nbytes"] > 0


def test_grayscale_decode():
    """Hand-build a 1-component stream by re-tagging an encoder output's
    luma-only variant: encode a gray RGB image and check channels agree."""
    g = np.repeat(np.linspace(0, 255, 16 * 16).reshape(16, 16, 1)
                  .astype(np.uint8), 3, axis=2)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, 95))
    # gray input: all channels near-equal after the YCbCr round trip
    assert int(np.abs(out[:, :, 0].astype(int)
                      - out[:, :, 1].astype(int)).max()) <= 2


def test_rejects():
    img = _structured(16, 16)
    good = jpeg.encode_jpeg(img, 85)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(good[:40])                    # truncated
    # arithmetic-coded SOF9 fails fast: retag the SOF0 marker
    arith = bytearray(good)
    sof = arith.find(b"\xff\xc0")
    assert sof > 0
    arith[sof + 1] = 0xC9
    with pytest.raises(ValueError, match="unsupported frame"):
        jpeg.decode_jpeg(bytes(arith))
    with pytest.raises(ValueError, match="unsupported frame"):
        jpeg.jpeg_meta(bytes(arith))
    with pytest.raises(ValueError):
        jpeg.jpeg_meta(b"\xff\xd8\xff\xd9")            # SOI+EOI, no SOF
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(img, 85, subsampling="4:1:0")
    with pytest.raises(ValueError):                    # sequential-only knob
        jpeg.encode_jpeg(img, 85, progressive=True, restart_interval=2)


def test_progressive_pixels_identical_to_sequential():
    """SOF2 + the 10-scan simple-progression script is a pure entropy-layer
    repackaging of the same quantized coefficients — decoded pixels must be
    byte-identical to the sequential stream's, for every sampling mode."""
    # shapes chosen so the luma width/height are NOT MCU-aligned under
    # subsampling (w % 16 in 1..8): the non-interleaved progressive scans
    # must traverse the component's own ceil(cw/8) grid, not the
    # MCU-padded one, or the streams desync silently (round-5 review)
    for h, w in ((41, 57), (24, 24), (16, 17), (64, 24), (33, 31)):
        img = _structured(h, w)
        for sub in ("4:4:4", "4:2:2", "4:2:0"):
            seq = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85,
                                                    subsampling=sub))
            pb = jpeg.encode_jpeg(img, 85, subsampling=sub,
                                  progressive=True)
            assert jpeg.jpeg_meta(pb)["progressive"] == 1
            assert (jpeg.decode_jpeg(pb) == seq).all(), (h, w, sub)


def test_restart_interval_pixels_identical():
    """DRI/RSTn is byte-aligned repackaging: decoded pixels must equal the
    no-restart stream's, at any interval, for every sampling mode."""
    img = _structured(41, 57)
    for sub in ("4:4:4", "4:2:0"):
        seq = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85, subsampling=sub))
        for ri in (1, 3, 7):
            rb = jpeg.encode_jpeg(img, 85, subsampling=sub,
                                  restart_interval=ri)
            assert rb.find(b"\xff\xdd") > 0            # DRI present
            assert (jpeg.decode_jpeg(rb) == seq).all(), (sub, ri)


def test_subsampled_round_trip_psnr():
    img = _structured(40, 56)
    for sub, min_psnr in (("4:2:2", 40.0), ("4:2:0", 37.0)):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85, subsampling=sub))
        assert out.shape == img.shape
        assert _psnr(img, out) >= min_psnr, sub


def test_fill_bytes_before_markers():
    """Spec-legal 0xFF padding before a marker (T.81 B.1.1.2) must parse."""
    img = _structured(24, 24)
    good = jpeg.encode_jpeg(img, 85)
    base = jpeg.decode_jpeg(good)
    i = good.find(b"\xff\xdb")
    padded = good[:i] + b"\xff\xff\xff" + good[i:]
    assert (jpeg.decode_jpeg(padded) == base).all()
    assert jpeg.jpeg_meta(padded)["width"] == 24


def test_mode_matrix_shapes():
    rng = np.random.default_rng(3)
    for shape in [(1, 1, 3), (7, 9, 3), (16, 17, 3), (33, 31, 3)]:
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        for kw in ({}, {"progressive": True}, {"restart_interval": 2},
                   {"subsampling": "4:2:0"}, {"subsampling": "4:2:2"},
                   {"subsampling": "4:2:0", "progressive": True}):
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(im, 80, **kw))
            assert out.shape == im.shape, (shape, kw)


def test_dispatch_integration():
    """The multimodal sniff dispatcher decodes JPEG payloads; the resize
    stage re-encodes JPEG in, JPEG out."""
    import pyarrow as pa

    from deepseek_ocr_rs_ray.fixtures.pages import gen_page, is_ocr_row, page_url
    from deepseek_ocr_rs_ray.functions.raster import decode_payload
    from deepseek_ocr_rs_ray.stages.multimodal import (
        ImageResizeStage, decode_image_payload, image_payload_meta)

    metas = [gen_page(i)["payload_meta"] for i in range(200)
             if is_ocr_row(page_url(i))]
    meta = metas[0]
    img, _s, _m = decode_payload(meta["payload"])
    jb = jpeg.encode_jpeg(img, 85)
    out, scale, margin = decode_image_payload(jb)
    assert out.shape == img.shape and scale == 0 and margin == 0
    assert _psnr(img, out) >= 30.0
    pm = image_payload_meta(jb)
    assert pm["width"] == img.shape[1] and pm["glyph_scale"] == -1

    batch = pa.table({
        "url": pa.array(["jpeg://a"]),
        "payload": pa.array([jb], pa.binary()),
    })
    thumbs = ImageResizeStage(thumb=16)(batch)["thumb"].to_pylist()
    assert jpeg.is_jpeg(thumbs[0])
    assert jpeg.decode_jpeg(thumbs[0]).shape == (16, 16, 3)
