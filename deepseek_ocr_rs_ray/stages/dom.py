"""DOM-extraction stage: the fast path of the extraction pipeline.

A callable class for ``map_batches(DomExtract, batch_format="pyarrow")`` —
regexes and config are compiled once per actor/task in ``__init__``
(the reference loads its model state once per worker the same way,
crates/infer-deepseek/src/model/mod.rs:946-1105). The batch body loops
rows (HTML parsing is inherently per-document, like any
trafilatura-style extractor) but everything around the loop is Arrow:
zero-copy input, columnar output, `html` dropped on output so the wide
binary payload never flows past this stage.

Output routing: rows whose DOM extraction fails AND that carry a raster
payload get ``method="ocr_pending"`` and keep the payload bytes; everything
else is finalized here with ``method="dom"``.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ExtractConfig
from ..functions.dom import extract_dom

SPAN_TYPE = pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64())]))


def size_class_of(n_bytes: int, cuts: Sequence[int]) -> int:
    """Bucket index for a byte length given ascending quantile cuts."""
    for i, c in enumerate(cuts):
        if n_bytes <= c:
            return i
    return len(cuts)


class DomExtract:
    def __init__(self, cfg: ExtractConfig = ExtractConfig(),
                 size_cuts: Optional[Sequence[int]] = None) -> None:
        self.cfg = cfg
        self.size_cuts = list(size_cuts) if size_cuts is not None else []

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()

        # vectorized per-row metadata: byte lengths via Arrow, size classes
        # via a single searchsorted against the quantile cuts
        lengths = pc.binary_length(pc.coalesce(batch.column("html"),
                                               pa.scalar(b"", pa.binary())))
        html_bytes = lengths.to_numpy(zero_copy_only=False).astype(np.int64)
        if self.size_cuts:
            size_classes = np.searchsorted(
                np.asarray(self.size_cuts, dtype=np.int64), html_bytes,
                side="left").astype(np.int32)
        else:
            size_classes = np.zeros(len(html_bytes), dtype=np.int32)

        texts: List[str] = []
        spans: List[list] = []
        methods: List[str] = []
        payloads: List[Optional[bytes]] = []
        pspans: List[Optional[dict]] = []
        dom_params = self.cfg.dom

        for url, html in zip(urls, htmls):
            if html is None:           # null payloads occur in real crawls
                html = b""
            res = extract_dom(html, dom_params)
            if res["ok"] or res["payload"] is None:
                texts.append(res["text"])
                spans.append([{"start": s, "end": e} for s, e in res["spans"]])
                methods.append("dom")
                payloads.append(None)
                pspans.append(None)
            else:
                texts.append("")
                spans.append([])
                methods.append("ocr_pending")
                payloads.append(res["payload"])
                ps = res["payload_span"]
                pspans.append({"start": ps[0], "end": ps[1]} if ps else None)

        n = len(urls)
        ms_per_row = (time.perf_counter() - t0) * 1000.0 / max(n, 1)
        return pa.table({
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "html_bytes": pa.array(html_bytes, pa.int64()),
            "size_class": pa.array(size_classes, pa.int32()),
            "extracted_text": pa.array(texts, pa.string()),
            "spans": pa.array(spans, SPAN_TYPE),
            "method": pa.array(methods, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "payload_span": pa.array(pspans, pa.struct([("start", pa.int64()),
                                                        ("end", pa.int64())])),
            "n_tiles": pa.array([0] * n, pa.int32()),
            "dom_ms": pa.array(np.full(n, ms_per_row, dtype=np.float64)),
        })
