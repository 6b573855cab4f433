"""PNG codec (functions/png.py): round trips over every filter type,
decode of every supported color type from hand-built chunk streams,
data-URL parsing, fail-fast rejects, and parity of the multimodal
sniff-dispatch path (PNG pixels == RAW2 pixels for the same image)."""

import base64
import binascii
import struct
import zlib

import numpy as np
import pytest

from deepseek_ocr_rs_ray.functions import png


def _rand_img(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_round_trip_all_filters(filter_type):
    img = _rand_img((37, 23, 3))
    data = png.encode_png(img, filter_type=filter_type)
    assert png.is_png(data)
    out = png.decode_png(data)
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert (out == img).all()


def test_round_trip_structured_image():
    # gradients + hard edges: exercises filter deltas beyond white noise
    y, x = np.mgrid[0:64, 0:48]
    img = np.stack([(y * 4) % 256, (x * 5) % 256,
                    ((y + x) % 2) * 255], axis=2).astype(np.uint8)
    for ft in range(5):
        assert (png.decode_png(png.encode_png(img, filter_type=ft)) == img).all()


def test_meta_header_only():
    img = _rand_img((11, 29, 3))
    m = png.png_meta(png.encode_png(img))
    assert (m["width"], m["height"]) == (29, 11)
    assert m["bit_depth"] == 8 and m["color_type"] == 2
    assert m["interlace"] == 0 and m["nbytes"] > 0


def _chunk(ctype, body):
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", binascii.crc32(ctype + body) & 0xFFFFFFFF))


def _build(w, h, depth, ctype, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (png.PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def _scanlines(px2d_bytes_rows):
    return b"".join(b"\x00" + r for r in px2d_bytes_rows)


def test_decode_grayscale():
    g = _rand_img((5, 4))
    data = _build(4, 5, 8, 0, _scanlines([g[y].tobytes() for y in range(5)]))
    assert (png.decode_png(data) == np.repeat(g[:, :, None], 3, axis=2)).all()


def test_decode_palette():
    pal = _rand_img((16, 3), seed=3)
    idx = np.random.default_rng(5).integers(0, 16, (6, 7), dtype=np.uint8)
    data = _build(7, 6, 8, 3,
                  _scanlines([idx[y].tobytes() for y in range(6)]),
                  extra=_chunk(b"PLTE", pal.tobytes()))
    assert (png.decode_png(data) == pal[idx]).all()


def test_decode_rgba_and_gray_alpha():
    rgba = _rand_img((3, 5, 4))
    data = _build(5, 3, 8, 6, _scanlines([rgba[y].tobytes() for y in range(3)]))
    assert (png.decode_png(data) == rgba[:, :, :3]).all()
    ga = _rand_img((4, 3, 2), seed=9)
    data = _build(3, 4, 8, 4, _scanlines([ga[y].tobytes() for y in range(4)]))
    assert (png.decode_png(data) == np.repeat(ga[:, :, :1], 3, axis=2)).all()


def test_rejects():
    img = _rand_img((8, 8, 3))
    good = png.encode_png(img)
    with pytest.raises(ValueError):
        png.decode_png(b"not a png")
    with pytest.raises(ValueError):
        png.decode_png(good[:40])                      # truncated
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF                                # flip an IDAT byte
    with pytest.raises((ValueError, zlib.error)):
        png.decode_png(bytes(corrupt))
    # 16-bit depth and Adam7 fail fast
    raw = _scanlines([img[y].tobytes() for y in range(8)])
    deep = bytearray(_build(8, 8, 8, 2, raw))
    deep[24] = 16                                      # IHDR bit_depth
    # fix IHDR crc
    body = bytes(deep[16:29])
    deep[29:33] = struct.pack(">I", binascii.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="8-bit"):
        png.decode_png(bytes(deep))
    inter = bytearray(_build(8, 8, 8, 2, raw))
    inter[28] = 1                                      # IHDR interlace
    body = bytes(inter[16:29])
    inter[29:33] = struct.pack(">I", binascii.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="interlac"):
        png.decode_png(bytes(inter))
    # palette image without PLTE
    with pytest.raises(ValueError, match="PLTE"):
        png.decode_png(_build(4, 4, 8, 3,
                              _scanlines([bytes(4)] * 4)))


def test_data_urls():
    img = _rand_img((6, 6, 3))
    data = png.encode_png(img)
    mime, b = png.parse_data_url(
        "data:image/png;base64," + base64.b64encode(data).decode())
    assert mime == "image/png" and (png.decode_png(b) == img).all()
    assert png.parse_data_url("data:,hi") == ("text/plain", b"hi")
    assert png.parse_data_url("data:text/csv,a%b") == ("text/csv", b"a%b")
    with pytest.raises(ValueError):
        png.parse_data_url("http://x/y.png")
    with pytest.raises(ValueError):
        png.parse_data_url("data:image/png;base64,!!!not-base64!!!")
    with pytest.raises(ValueError):
        png.parse_data_url("data:image/png;base64")    # no comma


def test_dispatch_parity_with_raw2():
    """The sniff dispatcher decodes a PNG re-encode of a RAW2 payload to the
    SAME pixels, and the resize stage keeps the input's format on output."""
    import pyarrow as pa

    from deepseek_ocr_rs_ray.fixtures.pages import gen_page, is_ocr_row, page_url
    from deepseek_ocr_rs_ray.functions.raster import decode_payload
    from deepseek_ocr_rs_ray.stages.multimodal import (
        ImageDecodeMeta, ImageResizeStage, decode_image_payload,
        image_payload_meta)

    metas = [gen_page(i)["payload_meta"] for i in range(200)
             if is_ocr_row(page_url(i))]
    assert metas, "fixture produced no OCR rows"
    for meta in metas[:4]:
        img, _s, _m = decode_payload(meta["payload"])
        png_bytes = png.encode_png(img)
        out, scale, margin = decode_image_payload(png_bytes)
        assert (out == img).all() and scale == 0 and margin == 0
        pm = image_payload_meta(png_bytes)
        assert pm["width"] == img.shape[1] and pm["height"] == img.shape[0]
        assert pm["glyph_scale"] == -1

    # resize stage: RAW2 in → RAW2 thumb; PNG in → PNG thumb, same pixels
    meta = metas[0]
    img, _s, _m = decode_payload(meta["payload"])
    batch = pa.table({
        "url": pa.array(["raw2://a", "png://a"]),
        "payload": pa.array([meta["payload"], png.encode_png(img)],
                            pa.binary()),
    })
    out = ImageResizeStage(thumb=16)(batch)
    thumbs = out["thumb"].to_pylist()
    assert not png.is_png(thumbs[0]) and png.is_png(thumbs[1])
    raw2_thumb, _, _ = decode_image_payload(thumbs[0])
    assert (png.decode_png(thumbs[1]) == raw2_thumb).all()

    # meta stage sees both formats in one batch
    m = ImageDecodeMeta()(batch)
    assert m.num_rows == 2
    assert m["glyph_scale"].to_pylist()[1] == -1


def test_apng_round_trip():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
              for _ in range(5)]
    data = png.encode_apng(frames)
    assert png.is_png(data) and png.is_apng(data)
    assert not png.is_apng(png.encode_png(frames[0]))
    out = png.decode_apng(data)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert (a == b).all()
    # a plain-PNG reader of the same bytes sees frame 0 (spec behavior)
    assert (png.decode_png(data) == frames[0]).all()
    # single-frame APNG
    one = png.decode_apng(png.encode_apng(frames[:1]))
    assert len(one) == 1 and (one[0] == frames[0]).all()


def test_apng_rejects():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        png.decode_apng(png.encode_png(img))        # no acTL
    with pytest.raises(ValueError):
        png.encode_apng([])
    with pytest.raises(ValueError):
        png.encode_apng([img, img[:4]])             # mismatched shapes


def test_frame_stage_apng_matches_raw2_clip():
    """FrameSampleStage over an APNG of the clip's frame slabs emits the
    SAME (frame_index, features) rows as the RAW2 vertical-stack fake."""
    import pyarrow as pa

    from deepseek_ocr_rs_ray.fixtures.pages import gen_page, is_ocr_row, page_url
    from deepseek_ocr_rs_ray.functions.raster import decode_payload
    from deepseek_ocr_rs_ray.stages.multimodal import FrameSampleStage

    metas = [gen_page(i)["payload_meta"] for i in range(200)
             if is_ocr_row(page_url(i))]
    meta = metas[0]
    img, _s, _m = decode_payload(meta["payload"])
    n_frames = max(img.shape[0] // 64, 1)
    frames = [img[t * 64:(t + 1) * 64] for t in range(n_frames)]
    batch = pa.table({
        "url": pa.array(["raw2://a", "apng://a"]),
        "payload": pa.array([meta["payload"], png.encode_apng(frames)],
                            pa.binary()),
    })
    out = FrameSampleStage(frame_h=64, stride=2)(batch).to_pandas()
    raw2 = out[out["url"] == "raw2://a"].reset_index(drop=True)
    apng = out[out["url"] == "apng://a"].reset_index(drop=True)
    assert len(raw2) == len(apng) > 0
    assert (raw2["frame_index"].values == apng["frame_index"].values).all()
    for a, b in zip(raw2["features"], apng["features"]):
        assert (np.asarray(a) == np.asarray(b)).all()
    with pytest.raises(NotImplementedError):
        FrameSampleStage(codec="mp4")
