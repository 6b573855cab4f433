"""Multimodal column stages: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The pipeline pattern is the product here — schema, batch sizing, actor
signature, output layout. Every image stage sniff-dispatches between two
codecs: real PNG (functions/png.py — spec-implemented on stdlib zlib, the
analogue of the reference's ``image::open`` path, crates/cli/src/app.rs:
136-149) and the deterministic RAW2 container (functions/raster.py). Video
containers stay stubbed (no ffmpeg/PyAV here). Stages:

- ``ImageDecodeMeta`` — header-only probe (no decompression): the cheap
  schema pass over a binary column.
- ``ImageResizeStage`` — decode → exact fixed-point bicubic thumbnail →
  re-encode; binary in, binary out.
- ``ImageFeatureStage`` — decode → deterministic grid features (mean-pooled
  intensity + ink density) → ``list<float>`` embedding column, ready for
  the similarity-search operators.
- ``FrameSampleStage`` — video frame sampling. Real codecs are STUBBED
  (NotImplementedError); the deterministic fake treats a RAW2 payload as a
  T-frame clip (vertical stack) and samples every k-th frame.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..functions import jpeg, png, raster
from ..functions.imageops import resize_bicubic

REAL_VIDEO_CODECS = False  # no ffmpeg/PIL in this container

JPEG_THUMB_QUALITY = 85


def decode_image_payload(payload: bytes):
    """Sniff-dispatch decode: PNG / baseline JPEG (functions/png.py,
    functions/jpeg.py — the real-format paths) or RAW2 →
    ((H, W, 3) uint8, glyph_scale, margin). PNG/JPEG carry no glyph
    raster metadata, so those fields are 0. Raises ValueError on none."""
    if png.is_png(payload):
        return png.decode_png(payload), 0, 0
    if jpeg.is_jpeg(payload):
        return jpeg.decode_jpeg(payload), 0, 0
    return raster.decode_payload(payload)


def image_payload_meta(payload: bytes):
    """Header-only metadata for any supported format (None = none of them).
    PNG/JPEG have no glyph_scale; reported as -1 so the column stays
    int64."""
    if png.is_png(payload) or jpeg.is_jpeg(payload):
        try:
            m = (png.png_meta(payload) if png.is_png(payload)
                 else jpeg.jpeg_meta(payload))
        except ValueError:
            return None
        return {"width": m["width"], "height": m["height"],
                "glyph_scale": -1, "nbytes": m["nbytes"]}
    return raster.payload_meta(payload)


class ImageDecodeMeta:
    """Payload header metadata, one row per decodable payload."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"url": [], "width": [], "height": [], "glyph_scale": [],
                "nbytes": []}
        for url, payload in zip(batch.column("url").to_pylist(),
                                batch.column("payload").to_pylist()):
            meta = image_payload_meta(payload) if payload else None
            if meta is None:
                continue
            rows["url"].append(url)
            rows["width"].append(meta["width"])
            rows["height"].append(meta["height"])
            rows["glyph_scale"].append(meta["glyph_scale"])
            rows["nbytes"].append(meta["nbytes"])
        return pa.table({"url": pa.array(rows["url"], pa.string()),
                         "width": pa.array(rows["width"], pa.int64()),
                         "height": pa.array(rows["height"], pa.int64()),
                         "glyph_scale": pa.array(rows["glyph_scale"], pa.int64()),
                         "nbytes": pa.array(rows["nbytes"], pa.int64())})


class ImageResizeStage:
    """Decode → exact bicubic thumbnail → re-encode (binary in/out)."""

    def __init__(self, thumb: int = 64) -> None:
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, thumbs, widths, heights = [], [], [], []
        for url, payload in zip(batch.column("url").to_pylist(),
                                batch.column("payload").to_pylist()):
            if not payload:
                continue
            try:
                img, scale, margin = decode_image_payload(payload)
            except ValueError:
                continue
            small = resize_bicubic(img, self.thumb, self.thumb)
            # re-encode in the INPUT's format
            if png.is_png(payload):
                thumbs.append(png.encode_png(small))
            elif jpeg.is_jpeg(payload):
                thumbs.append(jpeg.encode_jpeg(small, JPEG_THUMB_QUALITY))
            else:
                thumbs.append(raster.encode_payload(small, scale, margin))
            urls.append(url)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
        return pa.table({"url": pa.array(urls, pa.string()),
                         "thumb": pa.array(thumbs, pa.binary()),
                         "orig_width": pa.array(widths, pa.int64()),
                         "orig_height": pa.array(heights, pa.int64())})


FEATURE_GRID = 4  # 4x4 mean-pool → 16 intensity dims + 1 ink-density dim


def image_features(img: np.ndarray) -> np.ndarray:
    """Deterministic (FEATURE_GRID² + 1)-dim features: mean-pooled grayscale
    grid + global ink density, float32 in [0, 1]."""
    g = img[:, :, 0].astype(np.float64)
    h, w = g.shape
    ys = np.linspace(0, h, FEATURE_GRID + 1).astype(np.int64)
    xs = np.linspace(0, w, FEATURE_GRID + 1).astype(np.int64)
    feats = np.empty(FEATURE_GRID * FEATURE_GRID + 1, dtype=np.float64)
    k = 0
    for i in range(FEATURE_GRID):
        for j in range(FEATURE_GRID):
            cell = g[ys[i]:max(ys[i + 1], ys[i] + 1),
                     xs[j]:max(xs[j + 1], xs[j] + 1)]
            feats[k] = cell.mean() / 255.0
            k += 1
    feats[k] = float((g < 128).mean())
    return feats.astype(np.float32)


class ImageFeatureStage:
    """Decode → feature vector column (list<float>), the embedding producer
    feeding the similarity-search operators."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, vecs = [], []
        for url, payload in zip(batch.column("url").to_pylist(),
                                batch.column("payload").to_pylist()):
            if not payload:
                continue
            try:
                img, _scale, _margin = decode_image_payload(payload)
            except ValueError:
                continue
            urls.append(url)
            vecs.append(image_features(img).tolist())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "features": pa.array(vecs, pa.list_(pa.float32()))})


class FrameSampleStage:
    """Multi-frame sampling over an opaque binary column.

    Containers, sniff-dispatched per payload:

    - **APNG** (``functions/png.py::decode_apng``) — a real animated-image
      standard, frames decoded independently (restricted full-canvas
      profile, validated);
    - **MJPEG AVI** (``functions/avi.py``) — a real RIFF video container,
      every frame an independent JPEG decoded by functions/jpeg.py;
    - **RAW2 clip fake** — a RAW2 payload of height T*frame_h read as a
      T-frame vertical stack.

    mp4/webm frame decode is NOT supported (no H.264/VP9 decoder in this
    environment; the mp4 CONTAINER parses via functions/mp4.py::mp4_meta);
    constructing with an unsupported ``codec`` raises NotImplementedError
    at init (per-actor, so misconfiguration fails fast). Every
    ``stride``-th frame's features are emitted.
    """

    def __init__(self, frame_h: int = 64, stride: int = 2,
                 codec: str = "raw2") -> None:
        if codec not in ("raw2", "apng", "avi"):
            raise NotImplementedError(
                f"video codec {codec!r} requires ffmpeg/PyAV, absent from "
                "this container — only 'raw2' clips, 'apng' and MJPEG "
                "'avi' are supported")
        self.frame_h = frame_h
        self.stride = stride

    def _frames(self, payload: bytes):
        from ..functions import avi
        if png.is_apng(payload):
            return png.decode_apng(payload)
        if avi.is_avi(payload):
            return avi.decode_avi_mjpeg(payload)
        img, _scale, _margin = decode_image_payload(payload)
        if png.is_png(payload) or jpeg.is_jpeg(payload):
            return [img]       # single-image formats = 1-frame clip
        # RAW2 only: the deterministic clip fake (vertical frame stack)
        n_frames = max(img.shape[0] // self.frame_h, 1)
        return [img[t * self.frame_h:(t + 1) * self.frame_h]
                for t in range(n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"url": [], "frame_index": [], "features": []}
        for url, payload in zip(batch.column("url").to_pylist(),
                                batch.column("payload").to_pylist()):
            if not payload:
                continue
            try:
                frames = self._frames(payload)
            except ValueError:
                continue
            for t in range(0, len(frames), self.stride):
                frame = frames[t]
                if frame.size == 0:
                    continue
                rows["url"].append(url)
                rows["frame_index"].append(t)
                rows["features"].append(image_features(frame).tolist())
        return pa.table({"url": pa.array(rows["url"], pa.string()),
                         "frame_index": pa.array(rows["frame_index"], pa.int64()),
                         "features": pa.array(rows["features"],
                                              pa.list_(pa.float32()))})
