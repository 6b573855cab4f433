"""Job / stage configuration dataclasses.

Semantics mirror the reference's config surface:

- ``VisionSettings`` — crates/core/src/inference.rs:13-18; shipped DeepSeek-OCR
  defaults base_size=1024, image_size=640, crop_mode=true
  (crates/config/src/config.rs:98-100).
- ``DecodeParameters`` — crates/core/src/inference.rs:21-79; shipped defaults
  max_new_tokens=512, greedy (do_sample=false), no_repeat_ngram_size=20.
- ``merge`` implements the left-outer patch-merge layering of
  crates/config/src/config.rs:330-376 (defaults <- file <- CLI <- request).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class VisionSettings:
    base_size: int = 1024
    image_size: int = 640
    crop_mode: bool = True


@dataclass(frozen=True)
class TilingParams:
    """Dynamic-tiling parameters (crates/infer-deepseek/src/vision/preprocess.rs:17-36)."""

    tile_size: int = 640
    base_size: int = 1024
    min_num: int = 2
    max_num: int = 9
    # OCR1 sets the small-image no-crop bypass to the tile size.
    small_image_no_crop_threshold: Optional[int] = 640

    @classmethod
    def ocr1(cls, base_size: int = 1024, tile_size: int = 640) -> "TilingParams":
        return cls(tile_size=tile_size, base_size=base_size, min_num=2, max_num=9,
                   small_image_no_crop_threshold=tile_size)

    @classmethod
    def ocr2(cls, base_size: int = 1024, tile_size: int = 640) -> "TilingParams":
        return cls(tile_size=tile_size, base_size=base_size, min_num=2, max_num=6,
                   small_image_no_crop_threshold=tile_size)


@dataclass(frozen=True)
class DecodeParameters:
    max_new_tokens: int = 512
    do_sample: bool = False
    temperature: float = 0.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: Optional[int] = 20
    seed: Optional[int] = None


@dataclass(frozen=True)
class DomParams:
    """Boilerplate-strip thresholds (engine-specific; Boilerpipe-style)."""

    min_block_chars: int = 40       # drop blocks shorter than this
    max_link_density: float = 0.33  # drop blocks with more anchor text than this
    min_doc_chars: int = 80         # below this, DOM extraction is considered failed


@dataclass(frozen=True)
class ExtractConfig:
    """Whole-pipeline configuration for the extraction job."""

    vision: VisionSettings = VisionSettings()
    tiling: TilingParams = TilingParams.ocr1()
    decode: DecodeParameters = DecodeParameters()
    dom: DomParams = DomParams()
    # Ray Data execution knobs
    # None = one batch per block: blocks are byte-bounded by the reader
    # (target_max_block_size), so a shard of 2 MB pages can never produce a
    # multi-GB batch the way a fixed row count would
    dom_batch_size: Optional[int] = None
    # OCR stage batch size; None = per-block like the DOM stage (most rows
    # pass through untouched, so small fixed batches would only add overhead)
    ocr_batch_size: Optional[int] = None
    # CPU request for the DOM task stage. A value different from
    # ocr_num_cpus makes the stages' remote args incompatible, which blocks
    # Ray's task→actor operator fusion: DOM work then spreads over every
    # free CPU as ordinary tasks instead of being capped at the OCR pool's
    # concurrency. None = 1.0 (fuses with a 1.0-CPU OCR pool).
    dom_num_cpus: Optional[float] = None
    # OCR actor-pool size; None = adapt to the cluster (total CPUs - 2)
    ocr_concurrency: Optional[int] = None
    ocr_num_cpus: float = 1.0
    size_classes: int = 4             # byte-length quantile buckets for skew handling
    size_sample_rows: int = 4096      # rows sampled (deterministically) for quantile cuts


def merge(base, patch):
    """Left-outer patch-merge: fields set (non-None) in ``patch`` override ``base``.

    Mirrors DecodeParametersPatch AddAssign layering
    (crates/core/src/inference.rs:81-120, crates/config/src/config.rs:533-556).
    ``patch`` may be a dataclass of the same type or a dict.
    """
    if patch is None:
        return base
    if dataclasses.is_dataclass(patch) and not isinstance(patch, type):
        patch = {f.name: getattr(patch, f.name) for f in dataclasses.fields(patch)}
    updates = {k: v for k, v in patch.items() if v is not None}
    return dataclasses.replace(base, **updates)
