"""WebM / Matroska (EBML) container parser — metadata only, stdlib.

Like functions/mp4.py: VP8/VP9/AV1 frame decode is impossible in this
container, so sample data stays fail-fast, but the CONTAINER layer (EBML,
public Matroska/WebM spec) parses fine: a varint element walker over
Segment → Info (TimecodeScale, Duration) and Tracks → TrackEntry
(TrackType, CodecID, Video PixelWidth/PixelHeight). ``encode_webm_skeleton``
writes a minimal valid header from metadata — the deterministic
fixture/oracle generator (no media clusters).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_DOCTYPE = 0x4282

_MASTERS = {_SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _EBML}


def is_webm(data: bytes) -> bool:
    return len(data) >= 4 and data[:4] == b"\x1a\x45\xdf\xa3"


def _read_vint(data: bytes, pos: int,
               keep_marker: bool) -> Tuple[int, int]:
    """EBML varint at ``pos`` → (value, new_pos). Element IDs keep the
    length-marker bit (keep_marker=True); sizes strip it."""
    if pos >= len(data):
        raise ValueError("EBML: truncated varint")
    first = data[pos]
    if first == 0:
        raise ValueError("EBML: invalid varint lead byte")
    n = 8 - first.bit_length() + 1          # leading zeros + 1
    if pos + n > len(data):
        raise ValueError("EBML: truncated varint body")
    val = first if keep_marker else first & (0xFF >> n)
    for i in range(1, n):
        val = (val << 8) | data[pos + i]
    return val, pos + n


def _walk(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end)."""
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        body_end = pos + size
        if body_end > end:
            raise ValueError("EBML: element overruns container")
        yield eid, pos, body_end
        pos = body_end


def _uint(data: bytes, s: int, e: int) -> int:
    return int.from_bytes(data[s:e], "big")


def _float(data: bytes, s: int, e: int) -> float:
    if e - s == 4:
        return struct.unpack(">f", data[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", data[s:e])[0]
    raise ValueError("EBML: bad float width")


def webm_meta(data: bytes) -> Dict:
    """Container metadata: doctype, duration_ms, tracks (type/codec/
    width/height). ValueError on malformed input."""
    if not is_webm(data):
        raise ValueError("not EBML (no magic)")
    doctype = ""
    timecode_scale = 1_000_000              # ns per timecode tick, default
    duration_ticks: Optional[float] = None
    tracks: List[Dict] = []
    for eid, s, e in _walk(data, 0, len(data)):
        if eid == _EBML:
            for e2, s2, e2e in _walk(data, s, e):
                if e2 == _DOCTYPE:
                    doctype = data[s2:e2e].decode("ascii", "replace")
        elif eid == _SEGMENT:
            for e2, s2, e2e in _walk(data, s, e):
                if e2 == _INFO:
                    for e3, s3, e3e in _walk(data, s2, e2e):
                        if e3 == _TIMECODE_SCALE:
                            timecode_scale = _uint(data, s3, e3e)
                        elif e3 == _DURATION:
                            duration_ticks = _float(data, s3, e3e)
                elif e2 == _TRACKS:
                    for e3, s3, e3e in _walk(data, s2, e2e):
                        if e3 != _TRACK_ENTRY:
                            continue
                        tr = {"type": 0, "codec": "", "width": 0,
                              "height": 0}
                        for e4, s4, e4e in _walk(data, s3, e3e):
                            if e4 == _TRACK_TYPE:
                                tr["type"] = _uint(data, s4, e4e)
                            elif e4 == _CODEC_ID:
                                tr["codec"] = data[s4:e4e].decode(
                                    "ascii", "replace")
                            elif e4 == _VIDEO:
                                for e5, s5, e5e in _walk(data, s4, e4e):
                                    if e5 == _PIXEL_WIDTH:
                                        tr["width"] = _uint(data, s5, e5e)
                                    elif e5 == _PIXEL_HEIGHT:
                                        tr["height"] = _uint(data, s5, e5e)
                        tracks.append(tr)
    if not doctype and not tracks:
        raise ValueError("EBML: no doctype or tracks")
    duration_ms = int(duration_ticks * timecode_scale / 1_000_000) \
        if duration_ticks is not None else 0
    return {"doctype": doctype, "duration_ms": duration_ms,
            "n_tracks": len(tracks), "tracks": tracks,
            "nbytes": len(data)}


def _vint_size(size: int) -> bytes:
    """Encode a size as a minimal EBML varint."""
    for n in range(1, 9):
        if size < (1 << (7 * n)) - 1:
            val = size | (1 << (7 * n))
            return val.to_bytes(n, "big")
    raise ValueError("EBML: size too large")


def _eid_bytes(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _elem(eid: int, body: bytes) -> bytes:
    return _eid_bytes(eid) + _vint_size(len(body)) + body


def encode_webm_skeleton(width: int, height: int, duration_ms: int,
                         codec: str = "V_VP9",
                         doctype: str = "webm") -> bytes:
    """Minimal valid EBML header + Segment(Info+Tracks) from metadata —
    no media clusters."""
    ebml = _elem(_EBML, _elem(_DOCTYPE, doctype.encode()))
    info = _elem(_INFO,
                 _elem(_TIMECODE_SCALE, (1_000_000).to_bytes(3, "big"))
                 + _elem(_DURATION, struct.pack(">d", float(duration_ms))))
    video = _elem(_VIDEO,
                  _elem(_PIXEL_WIDTH,
                        width.to_bytes(max((width.bit_length() + 7) // 8, 1),
                                       "big"))
                  + _elem(_PIXEL_HEIGHT,
                          height.to_bytes(
                              max((height.bit_length() + 7) // 8, 1),
                              "big")))
    entry = _elem(_TRACK_ENTRY, _elem(_TRACK_TYPE, b"\x01")
                  + _elem(_CODEC_ID, codec.encode()) + video)
    tracks = _elem(_TRACKS, entry)
    return ebml + _elem(_SEGMENT, info + tracks)
