"""Image preprocessing ops (byte-identity-critical), vectorized NumPy.

Ported semantics (not code) from the reference:

- ``round_ties_to_even``  — crates/infer-deepseek/src/model/mod.rs:2295-2306
- ``build_global_view``   — model/mod.rs:2308-2330 (pad-to-square gray canvas,
  aspect-preserving bicubic resize, round-half-even offsets)
- ``resize_bicubic``      — crates/infer-deepseek/src/vision/resample.rs:9-160
  (Pillow-identical fixed-point separable bicubic: 22-bit precision,
  half-toward-zero window bounds, clip8)
- ``best_grid`` / ``dynamic_tile`` — crates/infer-deepseek/src/vision/
  preprocess.rs:50-138 (candidate (i,j) grids, closest-aspect argmin with
  area tie-break, small-image bypass)
- ``normalize_chw``       — model/mod.rs:2332-2347 ((x/255-0.5)/0.5, CHW)

All arithmetic is integer or exact IEEE double reproducing the reference's
operation order, so output rasters are byte-identical regardless of batch
boundaries or parallelism.
"""

from __future__ import annotations

import math
from functools import lru_cache as _lru_cache
from typing import List, Optional, Tuple

import numpy as np

from ..config import TilingParams

PRECISION_BITS = 22
PRECISION_SCALE = float(1 << PRECISION_BITS)
ROUNDING_BIAS = 1 << (PRECISION_BITS - 1)
GRAY_MEAN = int(0.5 * 255.0)  # 127, the canvas fill (model/mod.rs:2309)


def round_ties_to_even(value: float) -> float:
    """Round half to even, matching model/mod.rs:2295-2306 exactly."""
    rounded = math.copysign(math.floor(abs(value) + 0.5), value)  # Rust f64::round
    if abs(value - rounded) != 0.5:
        return rounded
    truncated = float(math.trunc(value))
    if int(truncated) % 2 == 0:
        return truncated
    return truncated + math.copysign(1.0, value)


def _round_half_towards_zero(value: float) -> int:
    """resample.rs:19-25."""
    if value >= 0.0:
        return int(math.floor(value + 0.5))
    return int(math.ceil(value + 0.5))


def _bicubic_kernel(x: np.ndarray) -> np.ndarray:
    """Catmull-Rom a=-0.5 kernel (resample.rs:27-36), float64."""
    a = -0.5
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x < 1.0
    m2 = (~m1) & (x < 2.0)
    x1 = x[m1]
    out[m1] = ((a + 2.0) * x1 - (a + 3.0)) * x1 * x1 + 1.0
    x2 = x[m2]
    out[m2] = (((x2 - 5.0) * x2 + 8.0) * x2 - 4.0) * a
    return out


@_lru_cache(maxsize=256)
def _compute_coeffs(input_size: int, output_size: int):
    """Per-output-index window bounds + 22-bit fixed-point weights.

    Mirrors resample.rs:38-104: window center (i+0.5)*scale, support
    2*filterscale, half-toward-zero bounds with clamping, per-window
    normalization, then symmetric round to int32. Fully vectorized over
    output indices — identical doubles to the scalar loop (same formulas,
    elementwise ops only).
    Returns (starts[int64 out], lengths[int64 out], coeffs int64 [out, ksize]).
    Cached per (in, out) size pair — callers treat the arrays as read-only
    (every use is a fancy-index or astype copy). ~2 ms/page on dense scans.
    """
    scale = input_size / output_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    ksize = int(math.ceil(support)) * 2 + 1
    ss = 1.0 / filterscale

    out_idx = np.arange(output_size, dtype=np.float64)
    centers = (out_idx + 0.5) * scale
    # round_half_towards_zero: floor(v+0.5) for v>=0, ceil(v+0.5) for v<0
    lo = centers - support
    hi = centers + support
    xmin = np.where(lo >= 0.0, np.floor(lo + 0.5), np.ceil(lo + 0.5)).astype(np.int64)
    xmax = np.where(hi >= 0.0, np.floor(hi + 0.5), np.ceil(hi + 0.5)).astype(np.int64)
    np.clip(xmin, 0, None, out=xmin)
    np.minimum(xmax, input_size, out=xmax)
    xmin = np.where(xmin >= input_size, max(input_size - 1, 0), xmin)
    xmax = np.where(xmax <= xmin, xmin + 1, xmax)
    lengths = xmax - xmin

    pos = xmin[:, None].astype(np.float64) + np.arange(ksize)[None, :]
    weights = _bicubic_kernel((pos - centers[:, None] + 0.5) * ss)
    valid = np.arange(ksize)[None, :] < lengths[:, None]
    weights = np.where(valid, weights, 0.0)
    totals = weights.sum(axis=1)
    nz = totals != 0.0
    weights[nz] = weights[nz] / totals[nz, None]
    # symmetric round-half-away, then truncation toward zero (i32 cast)
    coeffs = np.where(weights < 0.0,
                      -0.5 + weights * PRECISION_SCALE,
                      0.5 + weights * PRECISION_SCALE).astype(np.int64)
    coeffs[~valid] = 0
    return xmin, lengths, coeffs, ksize


@_lru_cache(maxsize=128)
def _gather_coeffs(input_size: int, output_size: int):
    """Cached (idx, coeffs) for the windowed resample: idx[out, k] clamped
    gather indices, coeffs float64 (out, k) fixed-point weights (zero beyond
    each window's length, so the clamped gather positions contribute 0).

    Weights are exact small integers in float64: every product/sum in the
    resample stays far below 2^53, so float64 accumulation is exact integer
    arithmetic — bit-identical results at any chunking or thread count.
    """
    starts, lengths, coeffs, ksize = _compute_coeffs(input_size, output_size)
    idx = np.minimum(starts[:, None] + np.arange(ksize)[None, :], input_size - 1)
    return np.ascontiguousarray(idx), coeffs.astype(np.float64)


def _resample_axis1(img: np.ndarray, out_size: int) -> np.ndarray:
    """Apply the 1-D fixed-point resample along axis 1 of (H, W, 3) uint8.

    k-term windowed gather-accumulate: O(H*out*k) instead of a dense
    O(H*out*in) matmul (k = 5 for upscale, ~2*ceil(2*scale)+1 downscale).
    """
    h, w, c = img.shape
    idx, coeffs = _gather_coeffs(w, out_size)
    ksize = idx.shape[1]
    acc = np.zeros((h, out_size, c), dtype=np.float64)
    src = img.astype(np.float64)
    for k in range(ksize):
        ck = coeffs[:, k]
        if not ck.any():
            continue
        acc += src[:, idx[:, k], :] * ck[None, :, None]
    acc_int = acc.astype(np.int64) + ROUNDING_BIAS
    np.right_shift(acc_int, PRECISION_BITS, out=acc_int)
    return np.clip(acc_int, 0, 255, out=acc_int).astype(np.uint8)


def resize_bicubic(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Pillow-identical fixed-point separable bicubic (resample.rs:106-160).

    img: uint8 array (H, W, 3); returns uint8 (height, width, 3).
    Horizontal pass first (producing uint8 intermediate rows), then vertical,
    matching the reference's two-pass clip8 discipline bit-for-bit.
    """
    if width == 0 or height == 0:
        return np.zeros((height, width, 3), dtype=np.uint8)
    img = np.ascontiguousarray(img, dtype=np.uint8)

    horizontal = _resample_axis1(img, width)
    transposed = np.ascontiguousarray(horizontal.transpose(1, 0, 2))
    vertical = _resample_axis1(transposed, height)
    return np.ascontiguousarray(vertical.transpose(1, 0, 2))


def build_global_view(img: np.ndarray, base_size: int) -> np.ndarray:
    """Pad-to-square gray canvas with centered aspect-preserving resize
    (model/mod.rs:2308-2330). Returns uint8 (base_size, base_size, 3)."""
    canvas = np.full((base_size, base_size, 3), GRAY_MEAN, dtype=np.uint8)
    orig_h, orig_w = img.shape[:2]
    if orig_w == 0 or orig_h == 0:
        return canvas
    scale = min(base_size / orig_w, base_size / orig_h)
    new_w = int(min(max(round_ties_to_even(orig_w * scale), 1.0), float(base_size)))
    new_h = int(min(max(round_ties_to_even(orig_h * scale), 1.0), float(base_size)))
    resized = resize_bicubic(img, new_w, new_h)
    x_off = int(round_ties_to_even((base_size - float(new_w)) * 0.5))
    y_off = int(round_ties_to_even((base_size - float(new_h)) * 0.5))
    canvas[y_off:y_off + new_h, x_off:x_off + new_w] = resized
    return canvas


def global_view_transform(orig_w: int, orig_h: int, base_size: int
                          ) -> Tuple[float, int, int, int, int]:
    """The (scale, new_w, new_h, x_off, y_off) placement used by
    ``build_global_view`` — exposed so downstream consumers (the OCR glyph
    sampler) can map source coordinates into the canvas deterministically."""
    scale = min(base_size / orig_w, base_size / orig_h)
    new_w = int(min(max(round_ties_to_even(orig_w * scale), 1.0), float(base_size)))
    new_h = int(min(max(round_ties_to_even(orig_h * scale), 1.0), float(base_size)))
    x_off = int(round_ties_to_even((base_size - float(new_w)) * 0.5))
    y_off = int(round_ties_to_even((base_size - float(new_h)) * 0.5))
    return scale, new_w, new_h, x_off, y_off


def candidate_grids(min_num: int, max_num: int) -> List[Tuple[int, int]]:
    """Sorted unique (w_ratio, h_ratio) grids with min<=w*h<=max
    (preprocess.rs:85-94; BTreeSet iteration order = sorted)."""
    grids = set()
    for n in range(min_num, max_num + 1):
        for i in range(1, n + 1):
            for j in range(1, n + 1):
                if min_num <= i * j <= max_num:
                    grids.add((i, j))
    return sorted(grids)


def best_grid(orig_w: int, orig_h: int, params: TilingParams) -> Tuple[int, int]:
    """Closest-aspect-ratio grid with the reference's area tie-break
    (preprocess.rs:96-111): on an exact diff tie, prefer the candidate iff
    image area > 0.5 * tile^2 * w*h."""
    aspect = orig_w / orig_h
    area = float(orig_w * orig_h)
    best = (1, 1)
    best_diff = float("inf")
    for w_ratio, h_ratio in candidate_grids(params.min_num, params.max_num):
        target = w_ratio / h_ratio
        diff = abs(aspect - target)
        if diff < best_diff:
            best_diff = diff
            best = (w_ratio, h_ratio)
        elif abs(diff - best_diff) < np.finfo(np.float64).eps and \
                area > 0.5 * (params.tile_size * params.tile_size * w_ratio * h_ratio):
            best = (w_ratio, h_ratio)
    return best


def dynamic_tile(img: np.ndarray, params: TilingParams,
                 use_thumbnail: bool = False
                 ) -> Tuple[List[np.ndarray], Tuple[int, int]]:
    """Dynamic tiling (preprocess.rs:66-138).

    Small-image bypass: both dims <= threshold → no tiles, grid (1,1).
    Otherwise resize to tile*grid with the fixed-point bicubic and crop
    tile_size×tile_size tiles row-major; optional thumbnail appended.
    Returns (tiles, (w_ratio, h_ratio)).
    """
    orig_h, orig_w = img.shape[:2]
    thr = params.small_image_no_crop_threshold
    if thr is not None and orig_w <= thr and orig_h <= thr:
        return [], (1, 1)

    grid = best_grid(orig_w, orig_h, params)
    target_w = params.tile_size * grid[0]
    target_h = params.tile_size * grid[1]
    resized = resize_bicubic(img, target_w, target_h)

    tiles = []
    for i in range(grid[0] * grid[1]):
        x = (i % grid[0]) * params.tile_size
        y = (i // grid[0]) * params.tile_size
        tiles.append(np.ascontiguousarray(
            resized[y:y + params.tile_size, x:x + params.tile_size]))
    if use_thumbnail and len(tiles) > 1:
        tiles.append(resize_bicubic(img, params.tile_size, params.tile_size))
    return tiles, grid


def tile_count(orig_w: int, orig_h: int, params: TilingParams,
               use_thumbnail: bool = False) -> int:
    """Tile count without materializing rasters (for metadata/golden checks)."""
    thr = params.small_image_no_crop_threshold
    if thr is not None and orig_w <= thr and orig_h <= thr:
        return 0
    grid = best_grid(orig_w, orig_h, params)
    n = grid[0] * grid[1]
    if use_thumbnail and n > 1:
        n += 1
    return n


def smart_resize(height: int, width: int, factor: int,
                 min_pixels: int, max_pixels: int) -> Tuple[int, int]:
    """Paddle/Dots/GLM size normalization (M8).

    Semantics of crates/infer-paddleocr/src/vision/preprocess.rs:261-300
    (same math in infer-dots and infer-glm): round dims to a multiple of
    ``factor``, clamp area into [min_pixels, max_pixels] via sqrt-beta
    scaling (floor when shrinking, ceil when growing), aspect<=200 guard.
    Returns (h_bar, w_bar).
    """
    def _round(v: float) -> float:  # Rust f64::round = half away from zero
        return math.copysign(math.floor(abs(v) + 0.5), v)

    factor_f = float(max(factor, 1))
    h = float(max(height, 1))
    w = float(max(width, 1))
    if h < factor_f:
        w = _round(w * factor_f / h)
        h = factor_f
    if w < factor_f:
        h = _round(h * factor_f / w)
        w = factor_f
    aspect = max(h, w) / min(h, w)
    if aspect > 200.0:
        raise ValueError(f"aspect ratio exceeds limit ({aspect})")
    h_bar = _round(h / factor_f) * factor_f
    w_bar = _round(w / factor_f) * factor_f
    area = h_bar * w_bar
    max_p = float(max(max_pixels, 1))
    min_p = float(max(min_pixels, 1))
    if area > max_p:
        beta = math.sqrt((h * w) / max_p)
        h_bar = math.floor((h / beta) / factor_f) * factor_f
        w_bar = math.floor((w / beta) / factor_f) * factor_f
    elif area < min_p:
        beta = math.sqrt(min_p / (h * w))
        h_bar = math.ceil((h * beta) / factor_f) * factor_f
        w_bar = math.ceil((w * beta) / factor_f) * factor_f
    if h_bar < factor_f or w_bar < factor_f:
        raise ValueError("resized dimensions smaller than factor")
    return int(h_bar), int(w_bar)


def patchify_row_major(data: np.ndarray, patch: int) -> np.ndarray:
    """Row-major patch extraction (M9, Paddle layout).

    Semantics of crates/infer-paddleocr/src/vision/preprocess.rs:178-205:
    per (grid_h, grid_w) patch, values ordered channel-major then row-major
    within the patch. data: float32 (H, W, 3) → (grid_h*grid_w,
    3*patch*patch).
    """
    h, w, c = data.shape
    if h % patch or w % patch:
        raise ValueError(f"dims ({h},{w}) not divisible by patch {patch}")
    gh, gw = h // patch, w // patch
    # (gh, patch, gw, patch, c) → (gh, gw, c, patch, patch)
    x = data.reshape(gh, patch, gw, patch, c).transpose(0, 2, 4, 1, 3)
    return np.ascontiguousarray(x.reshape(gh * gw, c * patch * patch))


def patchify_merge_blocks(data: np.ndarray, patch: int,
                          merge_size: int) -> np.ndarray:
    """Merge-block-ordered patch extraction (M9, Dots layout).

    Semantics of crates/infer-dots/src/vision/preprocess.rs:189-232: patches
    emitted block-by-block over (merge_size × merge_size) superblocks.
    """
    h, w, c = data.shape
    if h % patch or w % patch:
        raise ValueError(f"dims ({h},{w}) not divisible by patch {patch}")
    gh, gw = h // patch, w // patch
    if gh % merge_size or gw % merge_size:
        raise ValueError(f"grid {gh}x{gw} not divisible by merge {merge_size}")
    bh, bw = gh // merge_size, gw // merge_size
    x = data.reshape(bh, merge_size, patch, bw, merge_size, patch, c)
    # → (bh, bw, merge_h, merge_w, c, patch_y, patch_x)
    x = x.transpose(0, 3, 1, 4, 6, 2, 5)
    return np.ascontiguousarray(x.reshape(gh * gw, c * patch * patch))


def tile_temporal(patches: np.ndarray, temporal: int) -> np.ndarray:
    """Temporal tiling (preprocess.rs:207-217): repeat the frame t times."""
    if temporal <= 1:
        return patches
    return np.concatenate([patches] * temporal, axis=0)


def position_metadata(grid: Tuple[int, int, int]
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-patch position/height/width ids (M10).

    Semantics of crates/infer-paddleocr/src/vision/preprocess.rs:219-235.
    """
    t, h, w = grid
    rows = np.repeat(np.arange(h, dtype=np.int64), w)
    cols = np.tile(np.arange(w, dtype=np.int64), h)
    pos = rows * w + cols
    return (np.tile(pos, t), np.tile(rows, t), np.tile(cols, t))


def normalize_chw(img: np.ndarray) -> np.ndarray:
    """uint8 HWC → float32 CHW normalized (x/255-0.5)/0.5 (model/mod.rs:2332-2347)."""
    x = img.astype(np.float32) / np.float32(255.0)
    x = (x - np.float32(0.5)) / np.float32(0.5)
    return np.ascontiguousarray(x.transpose(2, 0, 1))
