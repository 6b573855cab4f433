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
from ..functions.extract_row import safe_ocr_decode_page


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
            return _passthrough(batch)

        # split: ~95% of rows pass through as zero-copy Arrow slices; only
        # the pending rows are materialized to Python for the decode
        mask_np = pending_mask.to_numpy(zero_copy_only=False)
        rest = batch.filter(pa.array(~mask_np))
        pend = batch.filter(pa.array(mask_np))

        t0 = time.perf_counter()
        cfg = self.cfg
        texts: List[str] = []
        tiles: List[int] = []
        for payload in pend.column("payload").to_pylist():
            text, n_tiles, _ = safe_ocr_decode_page(
                payload, cfg.vision, cfg.tiling, cfg.decode)
            texts.append(text)
            tiles.append(n_tiles)
        ocr_ms = (time.perf_counter() - t0) * 1000.0

        from .dom import SPAN_TYPE
        spans = [[ps] if ps is not None else []
                 for ps in pend.column("payload_span").to_pylist()]
        idx = {name: pend.schema.get_field_index(name)
               for name in ("extracted_text", "method", "n_tiles", "spans")}
        pend = (pend
                .set_column(idx["extracted_text"], "extracted_text",
                            pa.array(texts, pa.string()))
                .set_column(idx["method"], "method",
                            pa.array(["ocr"] * pend.num_rows, pa.string()))
                .set_column(idx["n_tiles"], "n_tiles",
                            pa.array(tiles, pa.int32()))
                .set_column(idx["spans"], "spans", pa.array(spans, SPAN_TYPE)))

        out_rest = _passthrough(rest)
        out_pend = _with_ocr_ms(pend, np.full(pend.num_rows,
                                              ocr_ms / max(pend.num_rows, 1)))
        return pa.concat_tables([out_rest, out_pend])


def _with_ocr_ms(batch: pa.Table, ms: np.ndarray) -> pa.Table:
    out = batch.drop_columns(["payload", "payload_span"])
    return out.append_column("ocr_ms", pa.array(ms, pa.float64()))


def _passthrough(batch: pa.Table) -> pa.Table:
    return _with_ocr_ms(batch, np.zeros(batch.num_rows, dtype=np.float64))
