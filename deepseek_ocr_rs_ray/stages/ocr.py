"""OCR-decode stage: the stateful actor-pool fallback.

``map_batches(OcrDecode, concurrency=N, batch_size=B, num_cpus=c)`` — the
actor pool replaces the reference server's mutex-serialized single model
(crates/server/src/state.rs:22, generation.rs:84-86) with N independent
replicas. Model state (glyph font table, tiling params, decode parameters —
the analogue of weights/tokenizer/RoPE caches, model/mod.rs:946-1105,
§2.3 A1-A6) is built once per actor in ``__init__``; per-row decode state
(token context, n-gram history — the KV-cache analogue) is created fresh
inside ``ocr_decode_page`` per row and dropped on return, mirroring
``PromptCacheGuard`` (crates/core/src/cache.rs:375-382).

Rows arrive mixed: ``method == "ocr_pending"`` rows are decoded; everything
else passes through untouched. The stage is therefore safe to run over the
whole stream without a routing shuffle — by this point the wide ``html``
column is gone and pass-through rows cost only Arrow column copies.
"""

from __future__ import annotations

import time
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ExtractConfig
from ..functions.extract_row import ocr_decode_page


class OcrDecode:
    def __init__(self, cfg: ExtractConfig = ExtractConfig()) -> None:
        # once-per-actor setup: force the deterministic font table and the
        # resample-coefficient cache to exist before the first batch
        from ..functions import raster  # noqa: F401  (builds FONT at import)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        pending_mask = pc.equal(batch.column("method"), "ocr_pending")
        n_pending = pc.sum(pc.cast(pending_mask, pa.int64())).as_py() or 0
        if n_pending == 0:
            return _finalize(batch, None, 0.0)

        t0 = time.perf_counter()
        idx = np.flatnonzero(pending_mask.to_numpy(zero_copy_only=False))
        payloads = batch.column("payload").take(pa.array(idx)).to_pylist()
        cfg = self.cfg

        decoded: List[dict] = []
        for payload in payloads:
            text, n_tiles, n_tokens = ocr_decode_page(
                payload, cfg.vision, cfg.tiling, cfg.decode)
            decoded.append({"text": text, "n_tiles": n_tiles})
        ocr_ms = (time.perf_counter() - t0) * 1000.0

        texts = batch.column("extracted_text").to_pylist()
        methods = batch.column("method").to_pylist()
        n_tiles = batch.column("n_tiles").to_pylist()
        spans = batch.column("spans").to_pylist()
        pspans = batch.column("payload_span").to_pylist()
        for j, i in enumerate(idx):
            texts[i] = decoded[j]["text"]
            methods[i] = "ocr"
            n_tiles[i] = decoded[j]["n_tiles"]
            spans[i] = [pspans[i]] if pspans[i] is not None else []

        from .dom import SPAN_TYPE
        patched = (batch
                   .set_column(batch.schema.get_field_index("extracted_text"),
                               "extracted_text", pa.array(texts, pa.string()))
                   .set_column(batch.schema.get_field_index("method"),
                               "method", pa.array(methods, pa.string()))
                   .set_column(batch.schema.get_field_index("n_tiles"),
                               "n_tiles", pa.array(n_tiles, pa.int32()))
                   .set_column(batch.schema.get_field_index("spans"),
                               "spans", pa.array(spans, SPAN_TYPE)))
        return _finalize(patched, idx, ocr_ms)


def _finalize(batch: pa.Table, ocr_idx, ocr_ms: float) -> pa.Table:
    """Drop the payload columns and attach per-row ocr_ms attribution."""
    n = batch.num_rows
    ms = np.zeros(n, dtype=np.float64)
    if ocr_idx is not None and len(ocr_idx) > 0:
        ms[ocr_idx] = ocr_ms / len(ocr_idx)
    out = batch.drop_columns(["payload", "payload_span"])
    return out.append_column("ocr_ms", pa.array(ms))
