"""ISO-BMFF (MP4) box parser — metadata only, stdlib struct.

True MP4 frame decode needs an H.264/H.265/AV1 decoder that doesn't exist
in this container, so sample data stays fail-fast (the multimodal stubs);
but the CONTAINER layer (ISO/IEC 14496-12, public) parses fine: a box
walker over ftyp/moov/trak/mdia/minf/stbl extracting brand, movie
timescale/duration, per-track handler + codec fourcc + visual dimensions.
That covers the schema pass a 100 TB video corpus needs before any decode
(dimension/duration/codec filters, partition by codec) — the same role
``jpeg_meta``/``png_meta`` play for images.

Encoder side: ``encode_mp4_skeleton`` writes a minimal valid
ftyp+moov(+empty mdat) structure from given metadata — the deterministic
fixture generator for tests and oracle tables (no media data).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _walk(data: bytes, pos: int, end: int):
    """Yield (box_type, body_start, body_end); handles 64-bit largesize
    and size==0 (extends to end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4: truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("MP4: box overruns container")
        yield btype, body, pos + size
        pos += size


def _parse_trak(data: bytes, s: int, e: int) -> Dict:
    track: Dict = {"handler": "", "codec": "", "width": 0, "height": 0}
    for btype, bs, be in _walk(data, s, e):
        if btype == b"tkhd":
            # width/height are the last two 16.16 fixed-point fields in
            # both tkhd versions (v0 84 bytes, v1 96 bytes)
            w, h = struct.unpack(">II", data[be - 8:be])
            track["width"] = w >> 16
            track["height"] = h >> 16
        elif btype == b"mdia":
            for b2, s2, e2 in _walk(data, bs, be):
                if b2 == b"hdlr":
                    track["handler"] = data[s2 + 8:s2 + 12].decode(
                        "ascii", "replace")
                elif b2 == b"minf":
                    for b3, s3, e3 in _walk(data, s2, e2):
                        if b3 == b"stbl":
                            for b4, s4, e4 in _walk(data, s3, e3):
                                if b4 == b"stsd" and e4 - s4 >= 16:
                                    track["codec"] = data[s4 + 12:s4 + 16] \
                                        .decode("ascii", "replace")
    return track


def mp4_meta(data: bytes) -> Dict:
    """Container-level metadata: brand, timescale, duration_ms, tracks
    (handler/codec/width/height). Raises ValueError when malformed."""
    if not is_mp4(data):
        raise ValueError("not an MP4 (no ftyp)")
    brand = ""
    timescale = 0
    duration = 0
    tracks: List[Dict] = []
    try:
        for btype, s, e in _walk(data, 0, len(data)):
            if btype == b"ftyp":
                brand = data[s:s + 4].decode("ascii", "replace")
            elif btype == b"moov":
                for b2, s2, e2 in _walk(data, s, e):
                    if b2 == b"mvhd":
                        ver = data[s2]
                        if ver == 1:
                            timescale, duration = struct.unpack(
                                ">IQ", data[s2 + 20:s2 + 32])
                        else:
                            timescale, duration = struct.unpack(
                                ">II", data[s2 + 12:s2 + 20])
                    elif b2 == b"trak":
                        tracks.append(_parse_trak(data, s2, e2))
    except struct.error as exc:
        raise ValueError(f"MP4: truncated box ({exc})") from exc
    if timescale == 0 and not tracks:
        raise ValueError("MP4: no moov metadata")
    duration_ms = int(duration * 1000 // timescale) if timescale else 0
    return {"brand": brand, "timescale": int(timescale),
            "duration_ms": duration_ms, "n_tracks": len(tracks),
            "tracks": tracks, "nbytes": len(data)}


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def encode_mp4_skeleton(width: int, height: int, duration_ms: int,
                        codec: str = "avc1", timescale: int = 1000,
                        brand: str = "isom",
                        mdat: Optional[bytes] = None) -> bytes:
    """Minimal valid ftyp+moov(+mdat) from metadata — the deterministic
    fixture/oracle generator (no real media samples)."""
    duration = duration_ms * timescale // 1000
    ftyp = _box(b"ftyp", brand.encode() + struct.pack(">I", 0)
                + b"isomiso2")
    mvhd = _box(b"mvhd", bytes(4) + struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, duration) + bytes(80))
    # spec-exact version-0 tkhd (84-byte body, 14496-12 §8.3.2): ver/flags,
    # creation+modification, track_ID at offset 12, reserved, duration,
    # reserved[2], layer/alternate_group/volume/reserved, identity matrix,
    # 16.16 width/height
    identity = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0,
                           0, 0, 0x40000000)
    tkhd = _box(b"tkhd", bytes(4) + bytes(8) + struct.pack(">I", 1)
                + bytes(4) + struct.pack(">I", duration) + bytes(8)
                + bytes(8) + identity
                + struct.pack(">II", width << 16, height << 16))
    hdlr = _box(b"hdlr", bytes(8) + b"vide" + bytes(12)
                + b"VideoHandler\x00")
    stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1)
                + _box(codec.encode()[:4].ljust(4), bytes(8)))
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    out = ftyp + moov
    if mdat is not None:
        out += _box(b"mdat", mdat)
    return out
