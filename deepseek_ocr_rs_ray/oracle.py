"""Single-process oracle: the byte-identity contract.

``oracle_extract_pages`` runs the full per-row extraction semantics in one
process with a plain Python loop — no Ray, no batching, no partitioning.
The Ray pipeline must produce byte-identical ``extracted_text`` (and equal
spans/method/n_tiles) per url at any parallelism (the analogue of the
reference's strict token gate, benchsuite/orchestrator.py:456-521).

This module also carries *independent naive implementations* of the
numerically hard ops (fixed-point bicubic, greedy token selection) written
as direct scalar loops. Unit tests cross-check the vectorized engine
implementations against these — two implementations agreeing is the same
evidence style the reference uses for its rust-vs-python strict gate.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np
import pyarrow as pa

from .config import ExtractConfig
from .functions.extract_row import extract_row

GOLDEN_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("extracted_text", pa.string()),
    ("spans", pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64())]))),
    ("method", pa.string()),
    ("n_tiles", pa.int32()),
])


def rows_to_golden_table(rows: List[dict]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "extracted_text": [r["extracted_text"] for r in rows],
            "spans": [[{"start": s, "end": e} for s, e in r["spans"]] for r in rows],
            "method": [r["method"] for r in rows],
            "n_tiles": [r["n_tiles"] for r in rows],
        },
        schema=GOLDEN_SCHEMA,
    )


def oracle_extract_pages(pages: pa.Table,
                         cfg: ExtractConfig = ExtractConfig()) -> pa.Table:
    """Reference extraction over a pages table, one row at a time."""
    urls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    return rows_to_golden_table([extract_row(u, h, cfg) for u, h in zip(urls, htmls)])


# ---------------------------------------------------------------------------
# Independent naive ports for cross-validation (scalar loops, no vectorization)
# ---------------------------------------------------------------------------

_PRECISION_BITS = 22
_PRECISION_SCALE = float(1 << _PRECISION_BITS)
_ROUNDING_BIAS = 1 << (_PRECISION_BITS - 1)


def _clip8(value: int) -> int:
    shifted = value >> _PRECISION_BITS
    return max(0, min(255, shifted))


def _round_half_towards_zero(value: float) -> int:
    return int(math.floor(value + 0.5)) if value >= 0.0 else int(math.ceil(value + 0.5))


def _kernel(x: float) -> float:
    a = -0.5
    x = abs(x)
    if x < 1.0:
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    if x < 2.0:
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return 0.0


def _coeffs_naive(input_size: int, output_size: int):
    scale = input_size / output_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    ksize = int(math.ceil(support)) * 2 + 1
    bounds = []
    coeffs = []
    for out_index in range(output_size):
        center = (out_index + 0.5) * scale
        xmin = max(_round_half_towards_zero(center - support), 0)
        xmax = min(_round_half_towards_zero(center + support), input_size)
        if xmin >= input_size:
            xmin = max(input_size - 1, 0)
        if xmax <= xmin:
            xmax = xmin + 1
        length = xmax - xmin
        ss = 1.0 / filterscale  # multiply by reciprocal, exactly as the
        # reference does (resample.rs:66-68) — dividing instead differs by
        # 1 ulp for non-power-of-two scales and can flip a rounded coeff
        row = [_kernel((xmin + i - center + 0.5) * ss) for i in range(length)]
        total = sum(row)
        if total != 0.0:
            row = [v / total for v in row]
        row_int = [int(-0.5 + v * _PRECISION_SCALE) if v < 0.0
                   else int(0.5 + v * _PRECISION_SCALE) for v in row]
        row_int += [0] * (ksize - length)
        bounds.append((xmin, length))
        coeffs.append(row_int)
    return bounds, coeffs, ksize


def resize_bicubic_naive(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Direct scalar-loop port of resample.rs:106-160 (slow; tests only)."""
    src_h, src_w = img.shape[:2]
    if width == 0 or height == 0:
        return np.zeros((height, width, 3), dtype=np.uint8)
    bx, cx, _ = _coeffs_naive(src_w, width)
    by, cy, _ = _coeffs_naive(src_h, height)
    img_i = img.astype(np.int64)

    horizontal = np.zeros((src_h, width, 3), dtype=np.uint8)
    for y in range(src_h):
        for dx in range(width):
            start, length = bx[dx]
            acc = [_ROUNDING_BIAS] * 3
            for i in range(length):
                w = cx[dx][i]
                px = img_i[y, start + i]
                acc[0] += int(px[0]) * w
                acc[1] += int(px[1]) * w
                acc[2] += int(px[2]) * w
            horizontal[y, dx] = [_clip8(a) for a in acc]

    hor_i = horizontal.astype(np.int64)
    output = np.zeros((height, width, 3), dtype=np.uint8)
    for dy in range(height):
        start, length = by[dy]
        for dx in range(width):
            acc = [_ROUNDING_BIAS] * 3
            for i in range(length):
                w = cy[dy][i]
                px = hor_i[start + i, dx]
                acc[0] += int(px[0]) * w
                acc[1] += int(px[1]) * w
                acc[2] += int(px[2]) * w
            output[dy, dx] = [_clip8(a) for a in acc]
    return output


def select_greedy_naive(logits: Sequence[float], context: Sequence[int],
                        repetition_penalty: float, no_repeat_ngram: int) -> int:
    """Independent scalar implementation of the greedy selection policy."""
    scores = [np.float32(v) for v in logits]
    if repetition_penalty > 0.0 and abs(repetition_penalty - 1.0) > 1.19e-7:
        pen = np.float32(repetition_penalty)
        for tok in dict.fromkeys(int(t) for t in context):
            if 0 <= tok < len(scores):
                scores[tok] = scores[tok] / pen if scores[tok] > 0 else scores[tok] * pen
    banned = set()
    if no_repeat_ngram and no_repeat_ngram > 1 and len(context) >= no_repeat_ngram - 1:
        hist = {}
        seq = [int(t) for t in context]
        for i in range(len(seq) - no_repeat_ngram + 1):
            win = tuple(seq[i:i + no_repeat_ngram])
            hist.setdefault(win[:-1], set()).add(win[-1])
        banned = hist.get(tuple(seq[len(seq) - (no_repeat_ngram - 1):]), set())
    filtered = [(-math.inf if i in banned else float(v)) for i, v in enumerate(scores)]
    if not any(math.isfinite(v) for v in filtered):
        filtered = [float(v) for v in scores]
    best_idx, best_val = None, None
    for i, v in enumerate(filtered):
        if not math.isfinite(v):
            continue
        if best_val is None or v > best_val:
            best_idx, best_val = i, v
    return best_idx if best_idx is not None else 0
