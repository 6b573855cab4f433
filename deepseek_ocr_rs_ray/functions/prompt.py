"""Prompt tokenization with image-placeholder expansion (M11) and the
mask-scatter image-token injection (J2), NumPy edition.

Ported semantics (not code) from crates/infer-deepseek/src/model/mod.rs:

- ``build_image_placeholders`` (mod.rs:2605-2689): PATCH_SIZE=16,
  DOWNSAMPLE_RATIO=4; OCR1 lays the token grid out with a row-break token
  per row (+ terminal for the global view), OCR2 flat (+ one terminal for
  the global view); local grid scales with the (width_crops, height_crops)
  tile shape, emitted only when the image was actually cropped.
- ``build_prompt_tokens`` (mod.rs:2536-2603): BOS id 0, prompt split on
  ``<image>``, per-segment tokenization, placeholder runs marked 1 in the
  parallel images_seq_mask.
- ``inject_image_tokens`` (mod.rs:1760-1857): scatter the per-image vision
  rows into the sequence positions where mask==1 (here: boolean-index
  assignment), text rows kept where mask==0 — exactness required.

The container has no HF tokenizer; ``Vocab`` is a deterministic stand-in
(word→id) so segment tokenization is reproducible. The *placeholder math*
is the parity-critical part and is tested against hand-derived counts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PATCH_SIZE = 16
DOWNSAMPLE_RATIO = 4
BOS_ID = 0
OCR1, OCR2 = "ocr1", "ocr2"


class Vocab:
    """Deterministic incremental word vocabulary (tokenizer stand-in)."""

    def __init__(self, image_token: str = "<image>") -> None:
        self.token_to_id: Dict[str, int] = {"<bos>": BOS_ID}
        self.image_token = image_token
        self.image_token_id = self._intern(image_token)

    def _intern(self, tok: str) -> int:
        if tok not in self.token_to_id:
            self.token_to_id[tok] = len(self.token_to_id)
        return self.token_to_id[tok]

    def encode(self, text: str) -> List[int]:
        return [self._intern(t) for t in text.split()]


def num_queries(size: int) -> int:
    """ceil((size/PATCH_SIZE) / DOWNSAMPLE_RATIO) — mod.rs:2636-2639."""
    grid = size // PATCH_SIZE
    return int(np.ceil(np.float32(grid) / np.float32(DOWNSAMPLE_RATIO)))


def build_image_placeholders(image_token_id: int,
                             crop_shape: Optional[Tuple[int, int]],
                             base_size: int, image_size: int,
                             crop_mode: bool, variant: str = OCR1) -> List[int]:
    """mod.rs:2605-2689 — placeholder token layout for one image."""
    out: List[int] = []

    def grid_with_row_breaks(rows: int, cols: int, terminal: bool) -> None:
        for _ in range(rows):
            out.extend([image_token_id] * cols)
            out.append(image_token_id)       # row break
        if terminal:
            out.append(image_token_id)

    def grid_flat(rows: int, cols: int) -> None:
        out.extend([image_token_id] * (rows * cols))

    if crop_mode:
        nq_global = num_queries(base_size)
        nq_local = num_queries(image_size)
        width_crops, height_crops = crop_shape if crop_shape else (1, 1)
        if width_crops > 1 or height_crops > 1:
            rows = nq_local * height_crops
            cols = nq_local * width_crops
            if variant == OCR1:
                grid_with_row_breaks(rows, cols, False)
            else:
                grid_flat(rows, cols)
        if variant == OCR1:
            grid_with_row_breaks(nq_global, nq_global, True)
        else:
            grid_flat(nq_global, nq_global)
            out.append(image_token_id)
    else:
        nq = num_queries(image_size)
        if variant == OCR1:
            grid_with_row_breaks(nq, nq, True)
        else:
            grid_flat(nq, nq)
            out.append(image_token_id)
    return out


def build_prompt_tokens(vocab: Vocab, prompt: str,
                        crop_shapes: Sequence[Optional[Tuple[int, int]]],
                        base_size: int, image_size: int, crop_mode: bool,
                        variant: str = OCR1) -> Tuple[np.ndarray, np.ndarray]:
    """mod.rs:2536-2603 — (tokens int64, images_seq_mask uint8)."""
    segments = prompt.split(vocab.image_token)
    if len(segments) - 1 != len(crop_shapes):
        raise ValueError(
            f"prompt/image mismatch: {len(segments) - 1} slots vs "
            f"{len(crop_shapes)} images")

    tokens: List[int] = [BOS_ID]
    mask: List[int] = [0]
    for idx, segment in enumerate(segments):
        ids = vocab.encode(segment)
        tokens.extend(ids)
        mask.extend([0] * len(ids))
        if idx < len(crop_shapes):
            ph = build_image_placeholders(vocab.image_token_id,
                                          crop_shapes[idx], base_size,
                                          image_size, crop_mode, variant)
            tokens.extend(ph)
            mask.extend([1] * len(ph))
    return np.asarray(tokens, dtype=np.int64), np.asarray(mask, dtype=np.uint8)


def inject_image_tokens(text_embeds: np.ndarray, vision_rows: np.ndarray,
                        mask: np.ndarray) -> np.ndarray:
    """J2 (mod.rs:1760-1857): positional scatter of vision rows into the
    masked sequence positions; text rows untouched. vision_rows must have
    exactly mask.sum() rows."""
    n_slots = int(mask.astype(bool).sum())
    if vision_rows.shape[0] != n_slots:
        raise ValueError(f"vision rows {vision_rows.shape[0]} != mask slots {n_slots}")
    out = text_embeds.copy()
    out[mask.astype(bool)] = vision_rows
    return out
