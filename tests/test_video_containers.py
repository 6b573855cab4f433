"""Video containers: MJPEG AVI (functions/avi.py — real RIFF container,
frames via the JPEG codec) and ISO-BMFF metadata (functions/mp4.py),
plus FrameSampleStage dispatch."""

import struct

import numpy as np
import pytest

from deepseek_ocr_rs_ray.functions import avi, jpeg, mp4


def _frames(n=4, h=24, w=32, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_avi_round_trip_container_lossless():
    """The container layer adds no loss: each decoded frame equals the
    decode of the standalone JPEG of the same frame."""
    frames = _frames()
    data = avi.encode_avi_mjpeg(frames, fps=10, quality=85)
    assert avi.is_avi(data)
    out = avi.decode_avi_mjpeg(data)
    assert len(out) == len(frames)
    for f, d in zip(frames, out):
        ref = jpeg.decode_jpeg(jpeg.encode_jpeg(f, 85))
        assert (d == ref).all()


def test_avi_meta_and_determinism():
    frames = _frames(5, 16, 48)
    data = avi.encode_avi_mjpeg(frames, fps=25)
    assert data == avi.encode_avi_mjpeg(frames, fps=25)
    m = avi.avi_meta(data)
    assert (m["width"], m["height"], m["n_frames"], m["fps"],
            m["codec"]) == (48, 16, 5, 25, "MJPG")


def test_avi_rejects():
    with pytest.raises(ValueError):
        avi.decode_avi_mjpeg(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        avi.encode_avi_mjpeg([])
    with pytest.raises(ValueError):
        avi.encode_avi_mjpeg([_frames(1)[0], _frames(1, h=8)[0]])
    good = avi.encode_avi_mjpeg(_frames(2))
    with pytest.raises(ValueError):
        avi.decode_avi_mjpeg(good[:40])             # truncated
    # non-MJPG fourcc fails fast
    bad = bytearray(good)
    i = bad.find(b"vidsMJPG")
    bad[i + 4:i + 8] = b"H264"
    with pytest.raises(ValueError, match="codec"):
        avi.decode_avi_mjpeg(bytes(bad))


def test_mp4_meta_round_trip():
    data = mp4.encode_mp4_skeleton(1920, 1080, 60000, codec="hev1",
                                   brand="mp42")
    assert mp4.is_mp4(data)
    m = mp4.mp4_meta(data)
    assert m["brand"] == "mp42" and m["duration_ms"] == 60000
    assert m["n_tracks"] == 1
    t = m["tracks"][0]
    assert (t["handler"], t["codec"], t["width"], t["height"]) \
        == ("vide", "hev1", 1920, 1080)


def test_mp4_largesize_and_rejects():
    data = mp4.encode_mp4_skeleton(64, 32, 1000)
    # rewrite ftyp as a 64-bit largesize box: parser must handle size==1
    (sz,) = struct.unpack(">I", data[:4])
    big = (struct.pack(">I", 1) + data[4:8] + struct.pack(">Q", sz + 8)
           + data[8:sz]) + data[sz:]
    m = mp4.mp4_meta(big)
    assert m["tracks"][0]["width"] == 64
    with pytest.raises(ValueError):
        mp4.mp4_meta(b"\x00\x00\x00\x08free")       # no ftyp
    with pytest.raises(ValueError):
        mp4.mp4_meta(data[:20])                     # truncated moov
    with pytest.raises(ValueError):
        mp4.mp4_meta(mp4._box(b"ftyp", b"isom\x00\x00\x00\x00"))  # no moov


def test_frame_stage_avi_dispatch():
    import pyarrow as pa

    from deepseek_ocr_rs_ray.stages.multimodal import FrameSampleStage
    frames = _frames(6, 64, 40)
    data = avi.encode_avi_mjpeg(frames, fps=10)
    batch = pa.table({"url": pa.array(["avi://a"]),
                      "payload": pa.array([data], pa.binary())})
    out = FrameSampleStage(frame_h=64, stride=2, codec="avi")(batch)
    assert out["frame_index"].to_pylist() == [0, 2, 4]
    with pytest.raises(NotImplementedError):
        FrameSampleStage(codec="mp4")


def test_webm_meta_round_trip():
    from deepseek_ocr_rs_ray.functions import webm
    data = webm.encode_webm_skeleton(1280, 720, 45000, codec="V_VP9")
    assert webm.is_webm(data)
    m = webm.webm_meta(data)
    assert m["doctype"] == "webm" and m["duration_ms"] == 45000
    t = m["tracks"][0]
    assert (t["type"], t["codec"], t["width"], t["height"]) \
        == (1, "V_VP9", 1280, 720)
    assert data == webm.encode_webm_skeleton(1280, 720, 45000,
                                             codec="V_VP9")


def test_webm_rejects():
    from deepseek_ocr_rs_ray.functions import webm
    good = webm.encode_webm_skeleton(64, 32, 1000)
    with pytest.raises(ValueError):
        webm.webm_meta(b"not ebml at all")
    with pytest.raises(ValueError):
        webm.webm_meta(good[:10])                    # truncated element
    with pytest.raises(ValueError):
        webm.webm_meta(b"\x1a\x45\xdf\xa3\x00")      # bad varint lead


def test_avi_meta_ignores_audio_stream():
    """A second (audio) strl must not overwrite the video codec
    (round-5 review: last-stream-wins bug)."""
    frames = _frames(2)
    data = bytearray(avi.encode_avi_mjpeg(frames))
    # append an audio strl (fccType 'auds', handler 'PCM ') to hdrl
    strh = b"auds" + b"PCM " + bytes(48)
    audio_strl = avi._list(b"strl", avi._chunk(b"strh", strh))
    i = data.find(b"LIST")
    (hdrl_size,) = struct.unpack("<I", data[i + 4:i + 8])
    patched = (bytes(data[:i + 4])
               + struct.pack("<I", hdrl_size + len(audio_strl))
               + bytes(data[i + 8:i + 8 + hdrl_size]) + audio_strl
               + bytes(data[i + 8 + hdrl_size:]))
    patched = (patched[:4]
               + struct.pack("<I", len(patched) - 8) + patched[8:])
    m = avi.avi_meta(patched)
    assert m["codec"] == "MJPG"
    assert len(avi.decode_avi_mjpeg(patched)) == 2


def test_mp4_tkhd_spec_offsets():
    """encode_mp4_skeleton's tkhd is the spec 84-byte v0 body: track_ID
    at offset 12, identity matrix, 16.16 dims at the end."""
    data = mp4.encode_mp4_skeleton(320, 200, 7000)
    i = data.find(b"tkhd")
    body = data[i + 4:]
    (size,) = struct.unpack(">I", data[i - 4:i])
    assert size == 8 + 84
    assert struct.unpack(">I", body[12:16])[0] == 1          # track_ID
    assert struct.unpack(">i", body[40:44])[0] == 0x00010000  # matrix[0]
    assert struct.unpack(">i", body[72:76])[0] == 0x40000000  # matrix[8]
    assert struct.unpack(">II", body[76:84]) == (320 << 16, 200 << 16)
