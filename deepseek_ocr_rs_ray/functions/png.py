"""Pure-stdlib PNG codec (zlib + numpy) — the real-image-format path.

The reference accepts real image files via ``image::open``
(crates/cli/src/app.rs:136-149) and base64 data-URLs
(crates/server/src/generation.rs:284-298). This container has no Pillow /
image crates, but PNG needs only zlib (stdlib) and per-scanline filter
arithmetic (numpy), so the format is implemented from the spec here rather
than stubbed: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), all five scanline filters, non-interlaced.
16-bit depth and Adam7 interlacing raise ValueError (fail-fast, like the
multimodal codec guards).

Decode returns (H, W, 3) uint8 RGB — the same array convention as
functions/raster.py — with alpha channels dropped (the downstream feature /
resize kernels are RGB-plane ops).
"""

from __future__ import annotations

import base64
import binascii
import struct
import zlib
from typing import Dict, Optional, Tuple

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

def _as_value_errors(fn):
    """Decode/meta entry points promise ValueError on ANY malformed input;
    truncated buffers surface as struct.error / IndexError and corrupt
    deflate streams as zlib.error from the internals — normalize them so
    callers' `except ValueError` row-skip guards actually skip the row."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, zlib.error, IndexError) as e:
            raise ValueError(f"{fn.__name__}: malformed input ({e})") from e
    return wrapped




def is_png(data: bytes) -> bool:
    return len(data) >= 8 and data[:8] == PNG_SIGNATURE


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG: truncated chunk body")
        crc = data[pos + 8 + length:pos + 12 + length]
        if len(crc) != 4:
            raise ValueError("PNG: truncated chunk crc")
        if struct.unpack(">I", crc)[0] != binascii.crc32(ctype + body) & 0xFFFFFFFF:
            raise ValueError(f"PNG: bad crc in {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG: missing IEND")


@_as_value_errors
def png_meta(data: bytes) -> Dict[str, int]:
    """Header-only probe (no decompression): IHDR fields."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR":
        raise ValueError("PNG: first chunk is not IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29])
    return {"width": int(w), "height": int(h), "bit_depth": int(depth),
            "color_type": int(ctype), "interlace": int(interlace),
            "nbytes": len(data)}


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → (height, stride) uint8.

    Up and Sub are vectorized (Sub via mod-256 cumsum per byte lane);
    Average/Paeth fall back to an in-row loop — they carry a strict
    left-neighbor dependency that has no closed numpy form.
    """
    expected = height * (1 + stride)
    if len(raw) != expected:
        raise ValueError(f"PNG: decompressed size {len(raw)} != {expected}")
    flat = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    ftypes = flat[:, 0]
    lines = flat[:, 1:]
    recon = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(ftypes[y])
        line = lines[y]
        if ft == 0:                                   # None
            cur = line.copy()
        elif ft == 1:                                 # Sub
            cur = line.copy()
            for j in range(bpp):
                lane = cur[j::bpp]
                lane[:] = np.cumsum(lane, dtype=np.uint64).astype(np.uint8)
        elif ft == 2:                                 # Up
            cur = line + prev                         # uint8 wraps = mod 256
        elif ft == 3:                                 # Average
            cur = line.copy()
            ci = cur.astype(np.int32)
            pi = prev.astype(np.int32)
            out = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = out[i - bpp] if i >= bpp else 0
                out[i] = (ci[i] + ((left + pi[i]) >> 1)) & 0xFF
            cur = out.astype(np.uint8)
        elif ft == 4:                                 # Paeth
            ci = line.astype(np.int32)
            pi = prev.astype(np.int32)
            out = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = out[i - bpp] if i >= bpp else 0   # left
                b = int(pi[i])                        # up
                c = int(pi[i - bpp]) if i >= bpp else 0  # up-left
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                out[i] = (ci[i] + pr) & 0xFF
            cur = out.astype(np.uint8)
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        recon[y] = cur
        prev = recon[y]
    return recon


@_as_value_errors
def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) uint8 RGB. Raises ValueError on unsupported
    shapes (16-bit, sub-byte depths, Adam7) or corrupt streams."""
    meta = png_meta(data)
    if meta["bit_depth"] != 8:
        raise ValueError(f"PNG: only 8-bit depth supported "
                         f"(got {meta['bit_depth']})")
    if meta["color_type"] not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {meta['color_type']}")
    if meta["interlace"] != 0:
        raise ValueError("PNG: Adam7 interlacing not supported")
    w, h, ctype = meta["width"], meta["height"], meta["color_type"]
    if w == 0 or h == 0:
        raise ValueError("PNG: zero-dimension image")
    idat = bytearray()
    palette: Optional[np.ndarray] = None
    for name, body in _chunks(data):
        if name == b"IDAT":
            idat.extend(body)
        elif name == b"PLTE":
            if len(body) % 3:
                raise ValueError("PNG: PLTE length not a multiple of 3")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
    channels = _CHANNELS[ctype]
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    recon = _unfilter(raw, h, stride, channels)
    px = recon.reshape(h, w, channels)
    if ctype == 2:                                    # RGB
        return np.ascontiguousarray(px)
    if ctype == 6:                                    # RGBA → drop alpha
        return np.ascontiguousarray(px[:, :, :3])
    if ctype == 0:                                    # gray
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if ctype == 4:                                    # gray+alpha → drop alpha
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    # ctype == 3: palette
    if palette is None:
        raise ValueError("PNG: palette image without PLTE chunk")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("PNG: palette index out of range")
    return np.ascontiguousarray(palette[idx])


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", binascii.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """(H, W, 3) uint8 RGB → PNG bytes (color type 2, single IDAT).

    ``filter_type`` applies one filter to every scanline — 0 (None) is the
    deterministic default; 1/2/3/4 exist so the decode path's unfilter
    arithmetic is round-trip-testable against this encoder.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w, _ = img.shape
    bpp = 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = img.reshape(h, w * bpp).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        cur = rows[y]
        if filter_type == 0:
            fl = cur
        elif filter_type == 1:      # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            fl = (cur - left) & 0xFF
        elif filter_type == 2:      # Up
            fl = (cur - prev) & 0xFF
        elif filter_type == 3:      # Average
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            fl = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:      # Paeth
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - upleft
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - upleft)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            fl = (cur - pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        out.append(filter_type)
        out.extend(fl.astype(np.uint8).tobytes())
        prev = cur
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out), level))
            + _chunk(b"IEND", b""))


# --- APNG (animated PNG) — the real multi-frame container -----------------
#
# Restricted profile (encoder emits it; decoder validates it): every frame
# is full-canvas (x=y=0, width/height = IHDR), dispose_op=NONE,
# blend_op=SOURCE, 8-bit RGB, each frame's data its own complete zlib
# stream. That makes every frame standalone — exactly the shape a
# distributed frame-sampling stage wants (no inter-frame compositing
# state). Out-of-profile APNGs raise ValueError (fail-fast, like the
# other codec guards).

_FCTL_LEN = 26


def is_apng(data: bytes) -> bool:
    """PNG signature + an acTL chunk before the first IDAT."""
    if not is_png(data):
        return False
    try:
        for name, _ in _chunks(data):
            if name == b"acTL":
                return True
            if name == b"IDAT":
                return False
    except ValueError:
        return False
    return False


def encode_apng(frames, level: int = 6) -> bytes:
    """List of same-shape (H, W, 3) uint8 frames → APNG bytes."""
    if not frames:
        raise ValueError("encode_apng needs at least one frame")
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("encode_apng frames must share one (H, W, 3)")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out = bytearray(PNG_SIGNATURE)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for k, f in enumerate(frames):
        fctl = struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, 1, 10, 0, 0)
        out += _chunk(b"fcTL", fctl)
        seq += 1
        raw = b"".join(b"\x00" + f[y].tobytes() for y in range(h))
        z = zlib.compress(raw, level)
        if k == 0:
            out += _chunk(b"IDAT", z)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


@_as_value_errors
def decode_apng(data: bytes):
    """APNG bytes → list of (H, W, 3) uint8 RGB frames (restricted
    profile; see module section comment)."""
    meta = png_meta(data)
    if meta["bit_depth"] != 8 or meta["color_type"] != 2:
        raise ValueError("APNG: only 8-bit RGB supported")
    w, h = meta["width"], meta["height"]
    n_frames: Optional[int] = None
    frames = []
    cur: Optional[bytearray] = None
    for name, body in _chunks(data):
        if name == b"acTL":
            n_frames = struct.unpack(">I", body[:4])[0]
        elif name == b"fcTL":
            if len(body) != _FCTL_LEN:
                raise ValueError("APNG: bad fcTL length")
            (_seq, fw, fh, x, y, _dn, _dd,
             dispose, blend) = struct.unpack(">IIIIIHHBB", body)
            if (fw, fh, x, y) != (w, h, 0, 0) or dispose != 0 or blend != 0:
                raise ValueError(
                    "APNG: only full-canvas NONE/SOURCE frames supported")
            if cur is not None:
                frames.append(bytes(cur))
            cur = bytearray()
        elif name == b"IDAT":
            if cur is None:
                raise ValueError("APNG: IDAT before first fcTL")
            cur += body
        elif name == b"fdAT":
            if cur is None:
                raise ValueError("APNG: fdAT before first fcTL")
            cur += body[4:]                       # strip sequence number
        elif name == b"IEND":
            if cur is not None:
                frames.append(bytes(cur))
    if n_frames is None:
        raise ValueError("not an APNG (no acTL chunk)")
    if len(frames) != n_frames:
        raise ValueError(f"APNG: {len(frames)} frames, acTL says {n_frames}")
    out = []
    for z in frames:
        recon = _unfilter(zlib.decompress(z), h, w * 3, 3)
        out.append(np.ascontiguousarray(recon.reshape(h, w, 3)))
    return out


def parse_data_url(url: str) -> Tuple[str, bytes]:
    """``data:<mime>;base64,<payload>`` → (mime, raw bytes). Plain (percent-
    free) non-base64 data URLs decode as latin-1 text. Raises ValueError on
    anything else — same contract as the reference's data-URL branch
    (crates/server/src/generation.rs:284-298)."""
    if not url.startswith("data:"):
        raise ValueError("not a data URL")
    head, sep, payload = url.partition(",")
    if not sep:
        raise ValueError("data URL missing ',' separator")
    spec = head[5:]
    if spec.endswith(";base64"):
        mime = spec[:-7] or "text/plain"
        try:
            return mime, base64.b64decode(payload, validate=True)
        except binascii.Error as e:
            raise ValueError(f"data URL: invalid base64 ({e})") from e
    return spec or "text/plain", payload.encode("latin-1")
