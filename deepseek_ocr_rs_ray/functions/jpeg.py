"""Baseline JPEG (JFIF) codec in pure numpy — the lossy real-format path.

The reference ingests real image files via ``image::open``
(crates/cli/src/app.rs:136-149), JPEG included. No libjpeg/Pillow exists in
this container, so baseline sequential JPEG is implemented from the public
spec (ITU-T T.81):

- **Encoder**: RGB → JFIF YCbCr, 4:4:4 (no subsampling), level shift,
  8×8 orthonormal DCT, quality-scaled Annex-K quantization tables,
  zigzag, DC-difference + AC run-length magnitude coding, per-image
  OPTIMIZED canonical Huffman tables (length-capped at 16 the way the
  spec's Annex K.2 adjustment does) emitted in DHT — so the decoder never
  depends on memorized fixed tables.
- **Decoder**: general baseline parser — reads DQT/DHT/SOF0/SOS from the
  stream (works against any baseline encoder's tables), Huffman-decodes
  the entropy stream with byte-unstuffing, dequantizes, inverse DCT,
  YCbCr → RGB. Supported: 8-bit, 1 or 3 components, 4:4:4 sampling.
  Progressive (SOF2), subsampled, arithmetic, 12-bit and
  restart-interval (DRI/RSTn) streams raise ValueError (fail-fast, like
  the other codec guards).

Lossy by nature: round trips assert closeness (PSNR) + bit-determinism,
not pixel identity; the oracle discipline for JPEG-fed queries pins the
distributed stage against the same single-process kernel (the
thumbs_expected pattern), not against pre-compression pixels.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

SOI, EOI, SOS, DQT, DHT, APP0 = 0xFFD8, 0xFFD9, 0xFFDA, 0xFFDB, 0xFFC4, 0xFFE0
SOF0, SOF1, SOF2 = 0xFFC0, 0xFFC1, 0xFFC2

# Annex K.1 example quantization tables (the de-facto standard baseline)
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int64)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZZ = np.argsort(_ZZ)

_N = np.arange(8)
_DCT = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) * 0.5
_DCT[0, :] *= 1 / np.sqrt(2)          # orthonormal: D @ B @ D.T


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


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"\xff\xd8"


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public formula)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _magnitude(v: int) -> Tuple[int, int]:
    """JPEG magnitude category + value bits for v."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, bits: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (bits & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _huff_lengths(freq: Dict[int, int], cap: int = 16) -> Dict[int, int]:
    """Code lengths for the symbols in ``freq`` — canonical Huffman with a
    libjpeg-style reserved extra symbol (no real symbol gets the all-ones
    code) and the spec's length-cap adjustment."""
    import heapq
    RESERVED = 256
    items = dict(freq)
    items[RESERVED] = 1                    # reserved: lowest freq
    heap = [(n, [s]) for s, n in items.items()]
    heapq.heapify(heap)
    depth: Dict[int, int] = {s: 0 for s in items}
    while len(heap) > 1:
        n1, s1 = heapq.heappop(heap)
        n2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (n1 + n2, s1 + s2))
    if len(items) == 1:                    # lone symbol still needs 1 bit
        depth = {s: 1 for s in items}
    # length-cap: count per length, move overflow up (Annex K.2 shape)
    counts = np.zeros(max(max(depth.values()), cap) + 2, dtype=np.int64)
    for d in depth.values():
        counts[d] += 1
    for i in range(len(counts) - 1, cap, -1):
        while counts[i] > 0:
            j = i - 2
            while counts[j] == 0:
                j -= 1
            counts[i] -= 2
            counts[i - 1] += 1
            counts[j] -= 1
            counts[j + 1] += 2
    # reassign capped lengths to symbols ordered by (original depth, symbol)
    order = sorted(depth, key=lambda s: (depth[s], s))
    lengths: Dict[int, int] = {}
    li = 1
    for s in order:
        while counts[li] == 0:
            li += 1
        lengths[s] = li
        counts[li] -= 1
    # drop the reserved symbol; it held the longest all-ones slot
    lengths.pop(RESERVED, None)
    return lengths


def _canonical_codes(lengths: Dict[int, int]):
    """(bits[1..16], ordered symbols, symbol→(code, length))."""
    bits = [0] * 17
    for d in lengths.values():
        bits[d] += 1
    symbols = sorted(lengths, key=lambda s: (lengths[s], s))
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for s in symbols:
        ln = lengths[s]
        code <<= (ln - prev_len)
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return bits[1:], symbols, codes


def _block_symbols(coefs: np.ndarray, prev_dc: int):
    """Zigzagged quantized block → (dc_symbol+bits, ac_symbol+bits list)."""
    dc = int(coefs[0])
    s, bits = _magnitude(dc - prev_dc)
    dcsym = (s, s, bits)
    acsyms = []
    run = 0
    nz = np.nonzero(coefs[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acsyms.append((0xF0, 0, 0))
            run -= 16
        s, bits = _magnitude(v)
        acsyms.append(((run << 4) | s, s, bits))
        run = 0
    if last < 63:
        acsyms.append((0x00, 0, 0))        # EOB
    return dcsym, acsyms, dc


def _to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _from_ycbcr(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) padded plane → (n_blocks, 8, 8) in raster block order."""
    h8, w8 = plane.shape
    return (plane.reshape(h8 // 8, 8, w8 // 8, 8)
                 .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (4:4:4, optimized
    per-image Huffman tables)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) uint8")
    h, w, _ = img.shape
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: zero-dimension image")
    qts = [_scaled_quant(QUANT_LUMA, quality),
           _scaled_quant(QUANT_CHROMA, quality)]
    ycc = _to_ycbcr(img)
    h8, w8 = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((h8, w8, 3), dtype=np.float64)
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1:h, :]       # edge-replicate pad
    padded[:, w:] = padded[:, w - 1:w]

    # quantized zigzag coefficients per component
    comp_coefs: List[np.ndarray] = []
    for c in range(3):
        qt = qts[0 if c == 0 else 1].astype(np.float64)
        blocks = _blocks_of(padded[:, :, c]) - 128.0
        f = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = np.round(f / qt).astype(np.int64)
        comp_coefs.append(q.reshape(-1, 64)[:, _ZZ])

    # pass 1: symbol statistics (interleaved MCU order = block order here)
    n_blocks = comp_coefs[0].shape[0]
    dc_freq = [dict(), dict()]
    ac_freq = [dict(), dict()]
    prev = [0, 0, 0]
    per_block: List[List[Tuple]] = []
    for b in range(n_blocks):
        row = []
        for c in range(3):
            t = 0 if c == 0 else 1
            dcsym, acsyms, prev[c] = _block_symbols(comp_coefs[c][b], prev[c])
            dc_freq[t][dcsym[0]] = dc_freq[t].get(dcsym[0], 0) + 1
            for sym, _, _ in acsyms:
                ac_freq[t][sym] = ac_freq[t].get(sym, 0) + 1
            row.append((dcsym, acsyms))
        per_block.append(row)

    tables = []
    for t in range(2):
        tables.append((_canonical_codes(_huff_lengths(dc_freq[t])),
                       _canonical_codes(_huff_lengths(ac_freq[t]))))

    # pass 2: entropy-coded data
    bw = _BitWriter()
    for row in per_block:
        for c in range(3):
            t = 0 if c == 0 else 1
            (_, _, dc_codes), (_, _, ac_codes) = tables[t]
            (dsym, dn, dbits), acsyms = row[c]
            code, ln = dc_codes[dsym]
            bw.write(code, ln)
            bw.write(dbits, dn)
            for sym, n, bits in acsyms:
                code, ln = ac_codes[sym]
                bw.write(code, ln)
                bw.write(bits, n)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(struct.pack(">H", SOI))
    out += seg(APP0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, qt in enumerate(qts):
        out += seg(DQT, bytes([i]) + bytes(qt.reshape(-1)[_ZZ].astype(np.uint8)))
    out += seg(SOF0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for t in range(2):
        (dc_bits, dc_syms, _), (ac_bits, ac_syms, _) = tables[t]
        out += seg(DHT, bytes([t]) + bytes(dc_bits) + bytes(dc_syms))
        out += seg(DHT, bytes([0x10 | t]) + bytes(ac_bits) + bytes(ac_syms))
    out += seg(SOS, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += struct.pack(">H", EOI)
    return bytes(out)


class _BitReader:
    """Entropy-stream reader over a pre-unstuffed byte array: a big-int
    window is sliced per read (amortized O(1) Python ops per symbol, not
    per bit)."""

    def __init__(self, data: bytes, pos: int) -> None:
        # unstuff once, vectorized: drop every 0x00 that follows a 0xFF
        arr = np.frombuffer(data, dtype=np.uint8)[pos:]
        prev_ff = np.concatenate([[False], arr[:-1] == 0xFF])
        stuffed = prev_ff & (arr == 0x00)
        # a 0xFF followed by a non-zero byte is a marker: entropy data ends
        marker = np.nonzero(prev_ff & (arr != 0x00))[0]
        end = int(marker[0]) - 1 if len(marker) else len(arr)
        arr = arr[:end][~stuffed[:end]]
        self.nbits = len(arr) * 8
        self.buf = arr.tobytes() + b"\x00\x00\x00\x00"   # 32-bit window pad
        self.pos = 0

    def _window(self) -> int:
        """32 big-endian bits starting at the current byte."""
        bp = self.pos >> 3
        return int.from_bytes(self.buf[bp:bp + 4], "big")

    def peek16(self) -> int:
        return (self._window() >> (16 - (self.pos & 7))) & 0xFFFF

    def bits_n(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("JPEG: entropy stream truncated")
        v = (self._window() >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)
        self.pos += n
        return v


def _decode_table(bits: List[int], symbols: List[int]) -> np.ndarray:
    """(65536, 2) LUT: 16-bit peek → (symbol, code length); length 0 =
    invalid prefix."""
    lut = np.zeros((1 << 16, 2), dtype=np.int32)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            base = code << (16 - ln)
            span = 1 << (16 - ln)
            lut[base:base + span, 0] = symbols[k]
            lut[base:base + span, 1] = ln
            code += 1
            k += 1
        code <<= 1
    return lut


def _read_symbol(br: _BitReader, lut: np.ndarray) -> int:
    if br.pos >= br.nbits:
        raise ValueError("JPEG: entropy stream truncated")
    sym, ln = lut[br.peek16()]
    if ln == 0:
        raise ValueError("JPEG: invalid Huffman code")
    br.pos += int(ln)
    return int(sym)


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


@_as_value_errors
def jpeg_meta(data: bytes) -> Dict[str, int]:
    """Header-only probe: SOF dimensions + component count."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker desync")
        marker = struct.unpack(">H", data[pos:pos + 2])[0]
        if marker in (SOF0, SOF1, SOF2):
            _prec, h, w, nc = struct.unpack(">BHHB", data[pos + 4:pos + 10])
            return {"width": int(w), "height": int(h), "components": int(nc),
                    "progressive": int(marker == SOF2), "nbytes": len(data)}
        if marker == EOI:
            break
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        pos += 2 + ln
    raise ValueError("JPEG: no SOF marker found")


@_as_value_errors
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) uint8 RGB (grayscale replicated)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], Dict] = {}
    comps: List[Tuple[int, int, int]] = []   # (id, qt_id, (h,v))
    scan: List[Tuple[int, int, int]] = []    # (comp_idx, dc_table, ac_table)
    h = w = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker desync")
        marker = struct.unpack(">H", data[pos:pos + 2])[0]
        if marker == EOI:
            raise ValueError("JPEG: EOI before SOS")
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + ln]
        if marker == DQT:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                qts[tq] = np.frombuffer(body[i + 1:i + 65],
                                        dtype=np.uint8).astype(np.int64)
                i += 65
        elif marker == DHT:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                syms = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _decode_table(bits, syms)
                i += 17 + n
        elif marker == SOF2:
            raise ValueError("JPEG: progressive streams unsupported")
        elif marker in (SOF0, SOF1):
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"JPEG: {nc}-component images unsupported")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError("JPEG: only 4:4:4 sampling supported")
                comps.append((cid, tq, hv))
        elif marker == SOS:
            ns = body[0]
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(i for i, (id_, _, _) in enumerate(comps)
                           if id_ == cid)
                scan.append((idx, tt >> 4, tt & 0xF))
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    else:
        raise ValueError("JPEG: no SOS marker")
    if not comps or h == 0 or w == 0:
        raise ValueError("JPEG: missing/empty SOF")

    br = _BitReader(data, pos)
    h8, w8 = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    n_blocks = (h8 // 8) * (w8 // 8)
    coefs = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in comps]
    prev = [0] * len(comps)
    for b in range(n_blocks):
        for ci, dc_t, ac_t in scan:
            dct = huff.get((0, dc_t))
            act = huff.get((1, ac_t))
            if dct is None or act is None:
                raise ValueError("JPEG: scan references missing DHT table")
            s = _read_symbol(br, dct)
            diff = _extend(br.bits_n(s), s)
            prev[ci] += diff
            blk = coefs[ci][b]
            blk[0] = prev[ci]
            k = 1
            while k < 64:
                sym = _read_symbol(br, act)
                if sym == 0x00:            # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if sym == 0xF0:            # ZRL
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("JPEG: coefficient index overflow")
                blk[k] = _extend(br.bits_n(size), size)
                k += 1

    planes = []
    for ci, (cid, tq, _hv) in enumerate(comps):
        if tq not in qts:
            raise ValueError("JPEG: component references missing DQT")
        dq = (coefs[ci] * qts[tq][None, :])[:, _UNZZ].reshape(-1, 8, 8)
        px = np.einsum("ji,njk,kl->nil", _DCT, dq.astype(np.float64), _DCT)
        px += 128.0
        plane = (px.reshape(h8 // 8, w8 // 8, 8, 8)
                   .transpose(0, 2, 1, 3).reshape(h8, w8))
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    return _from_ycbcr(np.stack(planes, axis=2))
