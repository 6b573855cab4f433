"""MJPEG-in-AVI (RIFF) video container in pure numpy/stdlib — the first
REAL video path (the reference is image-only; video containers are the
LLM-data-pipeline extension, previously APNG-only).

AVI is RIFF (public Microsoft spec): a ``hdrl`` LIST with the main header
(``avih``) and one video stream (``strh`` 'vids'/'MJPG' + ``strf``
BITMAPINFOHEADER), a ``movi`` LIST of ``00dc`` compressed-frame chunks
(each an independent JPEG — decoded by functions/jpeg.py, so every JPEG
mode the codec supports works inside the container), and an ``idx1``
index. Chunks pad to even sizes per RIFF.

Encoder writes a deterministic fixed layout; decoder is a general RIFF
walker (tolerates unknown chunks/LISTs, validates the MJPG fourcc,
fail-fast ValueError on malformed structure like the other codecs).
"""

from __future__ import annotations

import struct
from typing import Dict, List

import numpy as np

from . import jpeg
from .jpeg import _as_value_errors

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def is_avi(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"AVI ")


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(frames: List[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """Uniform (H, W, 3) uint8 frames → MJPEG AVI bytes."""
    if not frames:
        raise ValueError("encode_avi_mjpeg: no frames")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("encode_avi_mjpeg: frames must share one size")
    payloads = [jpeg.encode_jpeg(f, quality) for f in frames]
    max_len = max(len(p) for p in payloads)

    avih = struct.pack("<10I", 1_000_000 // fps, max_len * fps, 0,
                       _AVIF_HASINDEX, len(frames), 0, 1, max_len, w, h)
    avih += bytes(16)                       # dwReserved[4]
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames),
                                            max_len, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = b"".join(_chunk(b"00dc", p) for p in payloads)
    movi = _list(b"movi", movi_body)

    idx = bytearray()
    off = 4                                 # offsets relative to 'movi' tag
    for p in payloads:
        idx += b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, len(p))
        off += 8 + len(p) + (len(p) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each RIFF chunk."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            raise ValueError("AVI: chunk overruns container")
        yield fourcc, body_start, body_end
        pos = body_end + (size & 1)


def _find_list(data: bytes, pos: int, end: int, kind: bytes):
    for fourcc, s, e in _walk(data, pos, end):
        if fourcc == b"LIST" and data[s:s + 4] == kind:
            return s + 4, e
    raise ValueError(f"AVI: missing {kind.decode()} list")


@_as_value_errors
def avi_meta(data: bytes) -> Dict[str, int]:
    """Header-only probe: dimensions, frame count, fps, codec fourcc."""
    if not is_avi(data):
        raise ValueError("not an AVI (no RIFF/AVI header)")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    hs, he = _find_list(data, 12, end, b"hdrl")
    meta: Dict[str, int] = {"nbytes": len(data)}
    for fourcc, s, e in _walk(data, hs, he):
        if fourcc == b"avih":
            us_per_frame, _, _, _, total, _, streams, _, w, h = \
                struct.unpack("<10I", data[s:s + 40])
            meta.update(width=int(w), height=int(h), n_frames=int(total),
                        fps=int(round(1_000_000 / us_per_frame))
                        if us_per_frame else 0, streams=int(streams))
        elif fourcc == b"LIST" and data[s:s + 4] == b"strl":
            for f2, s2, e2 in _walk(data, s + 4, e):
                # only the VIDEO stream's handler is the codec — an
                # audio strl (fccType 'auds') must not overwrite it
                if f2 == b"strh" and data[s2:s2 + 4] == b"vids":
                    meta["codec"] = data[s2 + 4:s2 + 8].decode("ascii",
                                                               "replace")
    if "width" not in meta:
        raise ValueError("AVI: missing avih header")
    return meta


@_as_value_errors
def decode_avi_mjpeg(data: bytes) -> List[np.ndarray]:
    """AVI bytes → list of (H, W, 3) uint8 frames (every ``..dc``/``..db``
    chunk JPEG-decoded)."""
    meta = avi_meta(data)
    if meta.get("codec") not in ("MJPG", "mjpg"):
        raise ValueError(f"AVI: unsupported codec {meta.get('codec')!r} "
                         "(only MJPG)")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    ms, me = _find_list(data, 12, end, b"movi")
    frames: List[np.ndarray] = []
    for fourcc, s, e in _walk(data, ms, me):
        if fourcc[2:4] in (b"dc", b"db"):
            frames.append(jpeg.decode_jpeg(data[s:e]))
    if not frames:
        raise ValueError("AVI: no video frames in movi list")
    return frames
