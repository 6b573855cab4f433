"""Deterministic raster payload codec + glyph model.

The container has no image codecs (no Pillow), so multimodal payloads use a
self-describing deterministic raw format ("RAW2"):

    b"RAW2" | w:u32le | h:u32le | glyph_scale:u16le | margin:u16le |
    zlib(RGB24 row-major bytes)

``glyph_scale``/``margin`` are raster metadata (like DPI in a TIFF header) —
the typed-metadata companion of an opaque binary column per the multimodal
column design. The page images render text with a deterministic 5×7 glyph
font; the OCR stage recovers glyph cells from the (bicubic-resampled) global
view and scores them against the font table — its per-cell logits feed the
reference's exact greedy-decode semantics (functions/sampling.py).

The font is generated, not drawn: each glyph is a seeded 35-bit pattern with
guaranteed minimum pairwise Hamming distance, which makes nearest-pattern
classification well-posed while staying fully deterministic.
"""

from __future__ import annotations

import zlib
from typing import List, Optional, Tuple

import numpy as np

MAGIC = b"RAW2"
GLYPH_W, GLYPH_H = 5, 7
CELL_W, CELL_H = GLYPH_W + 1, GLYPH_H + 1  # 1-glyph-pixel spacing
DEFAULT_MARGIN = 2                          # glyph-pixel units

# OCR vocabulary: index 0 = EOS, 1 = newline, 2 = space, then the charset.
CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,-:!?'"
EOS_ID = 0
NEWLINE_ID = 1
SPACE_ID = 2
VOCAB = ["<eos>", "\n", " "] + list(CHARSET)
CHAR_TO_ID = {c: i + 3 for i, c in enumerate(CHARSET)}
CHAR_TO_ID[" "] = SPACE_ID
CHAR_TO_ID["\n"] = NEWLINE_ID


def _gen_font() -> np.ndarray:
    """Deterministic glyph table: (len(CHARSET), 7, 5) uint8 in {0,1}.

    Seeded per-codepoint; regenerated (bounded, deterministic) until every
    pair differs in >= 8 of the 35 cells.
    """
    glyphs: List[np.ndarray] = []
    for ch in CHARSET:
        for attempt in range(64):
            rng = np.random.default_rng((0xD5EE0C12, ord(ch), attempt))
            g = (rng.random((GLYPH_H, GLYPH_W)) < 0.45).astype(np.uint8)
            if g.sum() < 6:      # too sparse to survive resampling
                continue
            if all(int(np.sum(g != other)) >= 8 for other in glyphs):
                glyphs.append(g)
                break
        else:  # pragma: no cover - charset is small, never reached
            raise RuntimeError(f"font generation failed for {ch!r}")
    return np.stack(glyphs)


FONT = _gen_font()          # (V-3, 7, 5)
_FONT_FLAT = FONT.reshape(len(CHARSET), -1).astype(np.int32)
_FONT_F32 = _FONT_FLAT.astype(np.float32)
_FONT_F32_INK = _FONT_F32.sum(axis=1)
_BLANK = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)


def encode_payload(img: np.ndarray, glyph_scale: int, margin: int) -> bytes:
    h, w = img.shape[:2]
    header = MAGIC + w.to_bytes(4, "little") + h.to_bytes(4, "little") + \
        glyph_scale.to_bytes(2, "little") + margin.to_bytes(2, "little")
    return header + zlib.compress(np.ascontiguousarray(img, dtype=np.uint8).tobytes(), 6)


def decode_payload(data: bytes) -> Tuple[np.ndarray, int, int]:
    """→ (uint8 (h,w,3) image, glyph_scale, margin). Raises on bad magic."""
    if data[:4] != MAGIC:
        raise ValueError("not a RAW2 payload")
    w = int.from_bytes(data[4:8], "little")
    h = int.from_bytes(data[8:12], "little")
    glyph_scale = int.from_bytes(data[12:14], "little")
    margin = int.from_bytes(data[14:16], "little")
    raw = zlib.decompress(data[16:])
    img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    return img, glyph_scale, margin


def payload_meta(data: bytes) -> Optional[dict]:
    """Header-only metadata probe (no decompression) — the cheap path for
    schema/metadata stages over opaque binary columns."""
    if len(data) < 16 or data[:4] != MAGIC:
        return None
    return {
        "width": int.from_bytes(data[4:8], "little"),
        "height": int.from_bytes(data[8:12], "little"),
        "glyph_scale": int.from_bytes(data[12:14], "little"),
        "margin": int.from_bytes(data[14:16], "little"),
        "nbytes": len(data),
    }


def render_text_image(text: str, glyph_scale: int,
                      margin: int = DEFAULT_MARGIN) -> np.ndarray:
    """Render charset text (lines separated by \\n) as black-on-white RGB.

    Canvas size = (margin*2 + cols*CELL_W, margin*2 + rows*CELL_H) glyph
    pixels, each scaled by ``glyph_scale``.
    """
    lines = text.split("\n")
    rows = len(lines)
    cols = max((len(l) for l in lines), default=0)
    gw = (2 * margin + cols * CELL_W) * glyph_scale
    gh = (2 * margin + rows * CELL_H) * glyph_scale
    img = np.full((gh, gw, 3), 255, dtype=np.uint8)
    for r, line in enumerate(lines):
        for c, ch in enumerate(line):
            if ch == " " or ch not in CHAR_TO_ID:
                continue
            glyph = FONT[CHAR_TO_ID[ch] - 3]
            y0 = (margin + r * CELL_H) * glyph_scale
            x0 = (margin + c * CELL_W) * glyph_scale
            block = np.where(glyph[:, :, None] == 1, 0, 255).astype(np.uint8)
            scaled = np.repeat(np.repeat(block, glyph_scale, 0), glyph_scale, 1)
            img[y0:y0 + GLYPH_H * glyph_scale, x0:x0 + GLYPH_W * glyph_scale] = scaled
    return img


def grid_shape(orig_w: int, orig_h: int, glyph_scale: int,
               margin: int) -> Tuple[int, int]:
    """(rows, cols) of glyph cells implied by the canvas dims + metadata."""
    cols = (orig_w // glyph_scale - 2 * margin) // CELL_W
    rows = (orig_h // glyph_scale - 2 * margin) // CELL_H
    return max(rows, 0), max(cols, 0)


def sample_cell_pattern(canvas: np.ndarray, orig_w: int, orig_h: int,
                        base_size: int, glyph_scale: int, margin: int,
                        row: int, col: int) -> np.ndarray:
    """Recover a 5×7 binary pattern for glyph cell (row, col) from the
    global-view canvas by nearest-pixel sampling at transformed glyph-pixel
    centers, threshold < 128 → ink. Pure integer/exact-double math."""
    from .imageops import global_view_transform
    scale, new_w, new_h, x_off, y_off = global_view_transform(orig_w, orig_h, base_size)
    pat = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    for gy in range(GLYPH_H):
        for gx in range(GLYPH_W):
            # center of glyph pixel (gx, gy) in source coordinates
            sx = ((margin + col * CELL_W + gx) + 0.5) * glyph_scale
            sy = ((margin + row * CELL_H + gy) + 0.5) * glyph_scale
            cx = min(max(int(sx * scale), 0), new_w - 1) + x_off
            cy = min(max(int(sy * scale), 0), new_h - 1) + y_off
            if canvas[cy, cx, 0] < 128:
                pat[gy, gx] = 1
    return pat


def sample_all_patterns(canvas: np.ndarray, orig_w: int, orig_h: int,
                        base_size: int, glyph_scale: int, margin: int,
                        rows: int, cols: int) -> np.ndarray:
    """Vectorized ``sample_cell_pattern`` over the whole glyph grid.

    Returns uint8 (rows, cols, GLYPH_H, GLYPH_W) — bit-identical to the
    scalar version (same integer/double math, just gathered at once).
    """
    from .imageops import global_view_transform
    scale, new_w, new_h, x_off, y_off = global_view_transform(orig_w, orig_h, base_size)

    col_i = np.arange(cols)
    row_i = np.arange(rows)
    gx_i = np.arange(GLYPH_W)
    gy_i = np.arange(GLYPH_H)

    # source-coordinate centers per (col, gx) and (row, gy)
    sx = ((margin + col_i[:, None] * CELL_W + gx_i[None, :]) + 0.5) * glyph_scale
    sy = ((margin + row_i[:, None] * CELL_H + gy_i[None, :]) + 0.5) * glyph_scale
    cx = np.clip((sx * scale).astype(np.int64), 0, new_w - 1) + x_off  # (cols, GW)
    cy = np.clip((sy * scale).astype(np.int64), 0, new_h - 1) + y_off  # (rows, GH)

    red = canvas[:, :, 0]
    # gather: (rows, GH, cols, GW) → transpose to (rows, cols, GH, GW)
    sampled = red[cy[:, :, None, None], cx[None, None, :, :]]
    return (sampled.transpose(0, 2, 1, 3) < 128).astype(np.uint8)


def sample_patterns_direct(img: np.ndarray, base_size: int, glyph_scale: int,
                           margin: int, rows: int, cols: int) -> np.ndarray:
    """Bit-identical to ``build_global_view`` + ``sample_all_patterns`` but
    computes ONLY the ~rows*cols*35 canvas pixels the glyph sampler reads,
    via the same two-pass fixed-point bicubic restricted to the needed
    row/column windows (exact clip8 discipline preserved; parity asserted in
    tests). Avoids materializing the base_size² canvas per page.
    """
    from .imageops import global_view_transform
    h, w = img.shape[:2]
    scale, new_w, new_h, x_off, y_off = global_view_transform(w, h, base_size)
    return _sample_patterns_resized(img, new_w, new_h, scale, scale,
                                    glyph_scale, margin, rows, cols)


def sample_patterns_tiled(img: np.ndarray, tile_size: int,
                          grid: Tuple[int, int], glyph_scale: int,
                          margin: int, rows: int, cols: int) -> np.ndarray:
    """Glyph patterns read from the DYNAMIC-TILE resize (M5 end-to-end).

    ``dynamic_tile`` resizes the page to ``tile_size*grid`` (anisotropic)
    and crops non-overlapping tiles that exactly cover that resize —
    sampling the resize IS sampling the tile stack, the same way the
    reference's decoder attends over the tile embeddings when the global
    view under-resolves (crates/infer-deepseek/src/model/mod.rs:2457-2492,
    tile stack 1707-1758). Same windowed fixed-point bicubic as the global
    path, with per-axis scales and no canvas padding.
    """
    h, w = img.shape[:2]
    tw, th = tile_size * grid[0], tile_size * grid[1]
    return _sample_patterns_resized(img, tw, th, tw / w, th / h,
                                    glyph_scale, margin, rows, cols)


def _sample_patterns_resized(img: np.ndarray, new_w: int, new_h: int,
                             scale_x: float, scale_y: float,
                             glyph_scale: int, margin: int,
                             rows: int, cols: int) -> np.ndarray:
    """Shared windowed-bicubic glyph sampler over a virtual (new_w, new_h)
    resize of ``img`` — bit-identical to materializing the resize with
    ``resize_bicubic`` and nearest-sampling glyph-pixel centers."""
    from .imageops import ROUNDING_BIAS, PRECISION_BITS, _compute_coeffs
    h, w = img.shape[:2]

    col_i = np.arange(cols)
    row_i = np.arange(rows)
    gx_i = np.arange(GLYPH_W)
    gy_i = np.arange(GLYPH_H)
    sx = ((margin + col_i[:, None] * CELL_W + gx_i[None, :]) + 0.5) * glyph_scale
    sy = ((margin + row_i[:, None] * CELL_H + gy_i[None, :]) + 0.5) * glyph_scale
    rx = np.clip((sx * scale_x).astype(np.int64), 0, new_w - 1)   # (cols, GW)
    ry = np.clip((sy * scale_y).astype(np.int64), 0, new_h - 1)   # (rows, GH)

    ux, inv_x = np.unique(rx, return_inverse=True)
    uy, inv_y = np.unique(ry, return_inverse=True)
    inv_x = inv_x.reshape(rx.shape)
    inv_y = inv_y.reshape(ry.shape)

    sx_starts, _, sx_co, kx = _compute_coeffs(w, new_w)
    sy_starts, _, sy_co, ky = _compute_coeffs(h, new_h)
    idx_x = np.minimum(sx_starts[ux][:, None] + np.arange(kx)[None, :], w - 1)
    idx_y = np.minimum(sy_starts[uy][:, None] + np.arange(ky)[None, :], h - 1)

    rows_needed = np.unique(idx_y)
    pos = np.searchsorted(rows_needed, idx_y)                    # (Y, ky)

    # float64 math is exact here (all values integers < 2^53) and ~10x
    # faster than int64 einsum. k-term fused gather-accumulate (same shape
    # as _resample_axis1) — no (R, X, kx) 3D temp, each term is a 2-D
    # uint8 gather multiplied in place.
    src = img[rows_needed][:, :, 0]                              # (R, w) uint8
    cox = sx_co[ux].astype(np.float64)                           # (X, kx)
    acc_f = np.zeros((src.shape[0], ux.shape[0]), dtype=np.float64)
    for k in range(kx):
        ck = cox[:, k]
        if not ck.any():
            continue
        acc_f += src[:, idx_x[:, k]] * ck[None, :]
    acc = acc_f.astype(np.int64)
    acc += ROUNDING_BIAS
    hv = np.clip(acc >> PRECISION_BITS, 0, 255)                  # (R, X)

    coy = sy_co[uy].astype(np.float64)                           # (Y, ky)
    acc2_f = np.zeros((uy.shape[0], ux.shape[0]), dtype=np.float64)
    for k in range(ky):
        ck = coy[:, k]
        if not ck.any():
            continue
        acc2_f += hv[pos[:, k]] * ck[:, None]
    acc2 = acc2_f.astype(np.int64)
    acc2 += ROUNDING_BIAS
    cv = np.clip(acc2 >> PRECISION_BITS, 0, 255)                 # (Y, X)

    sampled = cv[inv_y[:, None, :, None], inv_x[None, :, None, :]]
    return (sampled < 128).astype(np.uint8)


def all_cell_logits(patterns: np.ndarray) -> np.ndarray:
    """Vectorized ``cell_logits`` over (rows, cols, GH, GW) patterns →
    float32 (rows, cols, V). Bit-identical to the scalar version.

    Hamming over {0,1} vectors via the exact identity
    |a-b|.sum() == a.sum() + b.sum() - 2*(a·b): the matmul form avoids the
    (cells, V, 35) broadcast temp (≈18 MB per dense page) that dominated
    memory traffic on wide scans — same integers, ~10x less allocation.
    """
    rows, cols = patterns.shape[:2]
    # float32 throughout: every value is a small integer (<= 70), exact in
    # f32, and the f32 matmul hits BLAS sgemm (int32 matmul has no BLAS
    # path — ~10x slower on dense pages).
    flat = patterns.reshape(rows * cols, -1).astype(np.float32)
    ink = flat.sum(axis=1)
    hamming = (ink[:, None] + _FONT_F32_INK[None, :]
               - np.float32(2.0) * (flat @ _FONT_F32.T))
    logits = np.empty((rows * cols, len(VOCAB)), dtype=np.float32)
    logits[:, EOS_ID] = -ink
    logits[:, NEWLINE_ID] = -np.inf
    logits[:, SPACE_ID] = -ink - np.float32(0.125)
    logits[:, 3:] = -hamming - np.float32(0.25)
    return logits.reshape(rows, cols, len(VOCAB))


def cell_logits(pattern: np.ndarray) -> np.ndarray:
    """Per-cell logits over VOCAB from a 5×7 binary pattern.

    - EOS: -(ink count) → an empty cell scores 0 (best) for EOS;
    - newline: never emitted by the classifier (-inf; layout emits it);
    - space: -(ink count) - 0.125 → empty cells prefer EOS over space only at
      end-of-text (the decode loop decides);
    - chars: -(Hamming distance to glyph) - 0.25.

    float32, so downstream penalty math matches the reference's f32 path.
    """
    flat = pattern.reshape(-1).astype(np.int32)
    ink = int(flat.sum())
    hamming = np.abs(_FONT_FLAT - flat[None, :]).sum(axis=1)
    logits = np.empty(len(VOCAB), dtype=np.float32)
    logits[EOS_ID] = -float(ink)
    logits[NEWLINE_ID] = -np.inf
    logits[SPACE_ID] = -float(ink) - 0.125
    logits[3:] = -(hamming.astype(np.float32)) - np.float32(0.25)
    return logits


def tokens_to_text(tokens: List[int]) -> str:
    """Decode token ids to text, skipping special EOS (tokenizer.decode with
    skip_special_tokens=true semantics, model/mod.rs:2437-2446)."""
    return "".join(VOCAB[t] for t in tokens if t != EOS_ID)
