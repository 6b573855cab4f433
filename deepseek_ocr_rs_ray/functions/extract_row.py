"""Per-row extraction kernel: DOM fast path + OCR-decode fallback.

This is the single-row semantic contract: the Ray pipeline (batched, actor
pools) and the single-process oracle both reduce to this per-row behavior,
and the byte-identity gate asserts they agree per url at any parallelism.

The OCR path mirrors the reference's decode lifecycle
(crates/infer-deepseek/src/model/mod.rs:2370-2454):

  prepare_vision_inputs (global view + dynamic tiles, §M4-M7)
  → per-step logits from the visual context (our deterministic glyph model
    standing in for SAM+CLIP+MoE-decoder — the container has no model
    weights; see functions/raster.py)
  → select_token_id greedy loop with repetition penalty + n-gram ban + EOS
    (crates/core/src/sampling.rs:34-158), fresh per-row state
    (PromptCacheGuard semantics, crates/core/src/cache.rs:375-382)
  → tokenizer decode + normalize_text (model/mod.rs:2437-2446,
    crates/core/src/inference.rs:228-233).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..config import DecodeParameters, ExtractConfig, TilingParams, VisionSettings
from . import raster
from .dom import extract_dom
from .imageops import best_grid, global_view_transform
from .sampling import NgramBanState, init_rng, select_token_id
from .textops import normalize_text


def page_tile_grid(w: int, h: int, vision: VisionSettings,
                   tiling: TilingParams) -> Tuple[Tuple[int, int], int]:
    """(grid, n_tiles) from page dims (header-only; no decompression)."""
    if vision.crop_mode:
        thr = tiling.small_image_no_crop_threshold
        if not (thr is not None and w <= thr and h <= thr):
            grid = best_grid(w, h, tiling)
            return grid, grid[0] * grid[1]
    return (1, 1), 0


def ocr_decode_page(payload: bytes, vision: VisionSettings,
                    tiling: TilingParams, decode: DecodeParameters
                    ) -> Tuple[str, int, int]:
    """Decode a raster payload to text. Returns (text, n_tiles, n_tokens).

    Per-row state (the emitted token context feeding the repetition penalty
    and n-gram ban) is created fresh inside the token generator and dropped
    on return — the KV-cache guard discipline.
    """
    meta = raster.payload_meta(payload)
    if meta is None:
        raise ValueError("not a RAW2 payload")
    _grid, n_tiles = page_tile_grid(meta["width"], meta["height"],
                                    vision, tiling)
    tokens = list(iter_decode_tokens(payload, vision, tiling, decode))
    text = normalize_text(raster.tokens_to_text(tokens))
    return text, n_tiles, len(tokens)


def iter_decode_tokens(payload: bytes, vision: VisionSettings,
                       tiling: TilingParams, decode: DecodeParameters):
    """Per-step token generator — the streaming decode loop (M14 emission
    order; stops at EOS / max_new_tokens / page exhaustion)."""
    img, glyph_scale, margin = raster.decode_payload(payload)
    h, w = img.shape[:2]

    global_size = vision.base_size if vision.crop_mode else vision.image_size
    grid, n_tiles = page_tile_grid(w, h, vision, tiling)

    rows, cols = raster.grid_shape(w, h, glyph_scale, margin)
    if rows == 0 or cols == 0:
        return

    # visual context: per-cell patterns + ink, and remaining-ink suffix sums
    # (the stand-in for attending over all vision tokens at each step).
    # Source selection (M5): when the global view under-resolves — one
    # glyph pixel maps to < 1 canvas pixel (glyph_scale * scale < 1), so
    # patterns sampled from it are unreliable — read the glyphs from the
    # dynamic-tile resize instead, like the reference decoding from the
    # tile embeddings alongside the global view
    # (crates/infer-deepseek/src/model/mod.rs:2457-2492). Both samplers
    # evaluate the transform lazily at exactly the sampled pixels —
    # bit-identical to building the canvas/tiles (tests/test_raster.py).
    scale = global_view_transform(w, h, global_size)[0]
    use_tiles = n_tiles > 0 and glyph_scale * scale < 1.0
    if use_tiles:
        patterns = raster.sample_patterns_tiled(
            img, tiling.tile_size, grid, glyph_scale, margin, rows, cols)
    else:
        patterns = raster.sample_patterns_direct(
            img, global_size, glyph_scale, margin, rows, cols)
    all_logits = raster.all_cell_logits(patterns)
    ink = patterns.reshape(rows, cols, -1).sum(axis=2).astype(np.int64)
    flat_ink = ink.reshape(-1)
    remaining_after = np.concatenate([np.cumsum(flat_ink[::-1])[::-1][1:], [0]])

    # Greedy fast path: with sampling off, the default penalty (1.0 =
    # no-op) and an empty n-gram ban set, select_token_id reduces to
    # first-index argmax of the raw logits — precompute it vectorized for
    # every cell and fall back to the full policy on the (rare) steps where
    # a ban is active, or always when do_sample is on (T3: the sampled
    # path must actually sample — crates/core/src/sampling.rs:34-102).
    # Equivalence is asserted by test_raster/test_sampling parity tests.
    penalty_noop = (decode.repetition_penalty <= 0.0 or
                    abs(decode.repetition_penalty - 1.0) <= np.finfo(np.float32).eps)
    sampling = bool(decode.do_sample and decode.temperature > 0.0)
    # one RNG per page, advanced through the token sequence (the reference
    # seeds StdRng once per request) — per-row state, dropped on return
    rng = init_rng(decode.seed) if sampling else None
    fast_path = penalty_noop and not sampling
    masked = all_logits.copy()
    masked[:, :, raster.EOS_ID] = np.float32(-1000.0)
    fast_argmax = masked.reshape(rows * cols, -1).argmax(axis=1)

    tokens: List[int] = []
    ban_state = NgramBanState(decode.no_repeat_ngram_size)
    step = 0
    done = False
    for r in range(rows):
        if done:
            break
        for c in range(cols + 1):  # cols cells then one line-break slot
            if step >= decode.max_new_tokens:
                done = True
                break
            cell_index = r * cols + c
            banned = ban_state.banned()
            if c < cols:
                remaining = flat_ink[cell_index] + remaining_after[cell_index]
                if remaining == 0:
                    # EOS logit 0.0 dominates every other (all <= -0.125)
                    tok = raster.EOS_ID
                elif fast_path and not banned:
                    tok = int(fast_argmax[cell_index])
                else:
                    logits = all_logits[r, c].copy()
                    logits[raster.EOS_ID] = np.float32(-1000.0)
                    tok = select_token_id(logits, decode, tokens, rng=rng,
                                          banned=banned)
            else:
                # line-break slot: newline unless the page is exhausted
                remaining = remaining_after[cell_index - 1] if cell_index > 0 \
                    else flat_ink.sum()
                if remaining == 0:
                    tok = raster.EOS_ID
                elif fast_path and not banned:
                    tok = raster.NEWLINE_ID
                else:
                    logits = np.full(len(raster.VOCAB), -np.inf, dtype=np.float32)
                    logits[raster.EOS_ID] = np.float32(0.0)
                    logits[raster.NEWLINE_ID] = np.float32(0.5)
                    tok = select_token_id(logits, decode, tokens, rng=rng,
                                          banned=banned)
            step += 1
            if tok == raster.EOS_ID:
                done = True
                break
            tokens.append(tok)
            ban_state.append(tok)
            yield tok


def stream_decode_page(payload: bytes, vision: VisionSettings,
                       tiling: TilingParams, decode: DecodeParameters):
    """K4/K5-analogue incremental emitter: yields per-step text DELTAS with
    the trailing-U+FFFD holdback discipline (DeltaTracker — M13), final
    flush included, so ``"".join(deltas)`` equals the raw decoded text (the
    reference streams raw deltas over SSE/stdout and normalizes at the end:
    crates/core/src/streaming.rs:21-62, crates/server/src/generation.rs).
    Demo/inspection path — the batch pipeline decodes whole pages."""
    from .textops import DeltaTracker
    tracker = DeltaTracker()
    tokens: List[int] = []
    for tok in iter_decode_tokens(payload, vision, tiling, decode):
        tokens.append(tok)
        delta = tracker.advance(raster.tokens_to_text(tokens), is_final=False)
        if delta:
            yield delta
    delta = tracker.advance(raster.tokens_to_text(tokens), is_final=True)
    if delta:
        yield delta


def safe_ocr_decode_page(payload: bytes, vision: VisionSettings,
                         tiling: TilingParams, decode: DecodeParameters
                         ) -> Tuple[str, int, int]:
    """Per-row fault isolation: a malformed payload (bad magic, corrupt
    zlib, degenerate header) yields an empty decode instead of killing the
    whole wave — the S2 'reject per-row, not per-job' discipline. The
    outcome is deterministic, so oracle and pipeline agree on bad rows too.
    """
    try:
        return ocr_decode_page(payload, vision, tiling, decode)
    except Exception:
        return "", 0, 0


def extract_row(url: str, html_bytes: bytes,
                cfg: ExtractConfig = ExtractConfig()) -> dict:
    """Full per-row extraction: DOM strip, OCR fallback, normalize.

    Returns {url, extracted_text, spans: [(start,end)...], method, n_tiles}.
    """
    if html_bytes is None:
        html_bytes = b""
    dom = extract_dom(html_bytes, cfg.dom)
    if dom["ok"] or dom["payload"] is None:
        return {
            "url": url,
            "extracted_text": dom["text"],
            "spans": dom["spans"],
            "method": "dom",
            "n_tiles": 0,
        }
    text, n_tiles, _ = safe_ocr_decode_page(dom["payload"], cfg.vision,
                                            cfg.tiling, cfg.decode)
    spans = [dom["payload_span"]] if dom["payload_span"] is not None else []
    return {
        "url": url,
        "extracted_text": text,
        "spans": spans,
        "method": "ocr",
        "n_tiles": n_tiles,
    }
