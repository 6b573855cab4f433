"""Block-quantization kernels (Q8_0 / Q4_K / Q6_K) in pure numpy.

The reference's batch data job is the DSQ export: discover tensors →
parallel quantize → atomic validated sink
(crates/dsq-cli/src/main.rs:278-405). Its quantize math is GGML block
quantization — Q8_0 inline (crates/dsq-writer/src/lib.rs:555-598), Q4_K /
Q6_K via Candle's `from_float`, which are line ports of the public ggml
reference kernels (quantize_row_q4_K_ref / quantize_row_q6_K_ref). This
module re-implements those public algorithms from their spec, vectorized
across blocks (every per-block search step is a matrix op over ALL blocks
at once — no Python loop over blocks), so a map_batches stage quantizes a
whole batch of tensor rows in numpy.

Formats (little-endian, byte layouts per the public ggml definitions):

- **Q8_0**: 32-value blocks → f16 scale (absmax/127) + 32 int8
  (round-half-away-from-zero, the Rust ``f32::round`` semantics the
  reference uses), 34 bytes/block.
- **Q4_K**: 256-value super-blocks, 8 sub-blocks of 32. Per sub-block an
  affine (scale, min) fit via the qkx2 grid search (21 candidate scales,
  weighted least-squares refit, keep the best weighted-MSE candidate);
  the 8 scales/mins are 6-bit re-quantized against super-scales d/dmin
  (f16) and packed into the standard 12-byte K-scale layout; values are
  4-bit offsets packed two per byte. 144 bytes/block.
- **Q6_K**: 256-value super-blocks, 16 sub-blocks of 16. Per sub-block a
  signed linear fit via the qx grid search (19 candidates around
  -32/max, x²-weighted), sub-scales 8-bit re-quantized against a f16
  super-scale d = max_scale/-128; values are 6-bit (-32..31)+32 split
  into 4 low bits (ql) + 2 high bits (qh). 210 bytes/block.

Dequantizers mirror the ggml reference exactly. All arithmetic is
float32 end to end (matching the reference's f32 kernels); the
vectorized kernels are parity-tested byte-for-byte against naive
per-block ports in tests/test_quant_kernels.py (the oracle.py
discipline).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

QK8_0 = 32
QK_K = 256
Q8_0_BLOCK_BYTES = QK8_0 + 2           # 34
Q4_K_BLOCK_BYTES = 2 + 2 + 12 + 128    # 144
Q6_K_BLOCK_BYTES = 128 + 64 + 16 + 2   # 210
GROUP_MAX_EPS = np.float32(1e-15)

_F32 = np.float32


def q_len(dtype: str, rows: int, cols: int) -> int:
    """Expected quantized payload length (the writer's validation rule)."""
    if dtype == "Q8_0":
        _check_cols("Q8_0", cols, QK8_0)
        return rows * (cols // QK8_0) * Q8_0_BLOCK_BYTES
    if dtype == "Q4_K":
        _check_cols("Q4_K", cols, QK_K)
        return rows * (cols // QK_K) * Q4_K_BLOCK_BYTES
    if dtype == "Q6_K":
        _check_cols("Q6_K", cols, QK_K)
        return rows * (cols // QK_K) * Q6_K_BLOCK_BYTES
    raise ValueError(f"unknown quant dtype {dtype!r}")


def _check_cols(name: str, cols: int, block: int) -> None:
    if cols <= 0 or cols % block:
        raise ValueError(f"{name}: in_dim {cols} not a multiple of {block}")


def _as_blocks(weights: np.ndarray, rows: int, cols: int,
               block: int) -> np.ndarray:
    w = np.asarray(weights, dtype=_F32).reshape(-1)
    if w.size != rows * cols:
        raise ValueError(f"weights size {w.size} != rows*cols {rows * cols}")
    return w.reshape(-1, block)


def _nearest_int(x: np.ndarray) -> np.ndarray:
    """ggml nearest_int: float32 round-half-to-even — made total over
    inf/NaN inputs (subnormal block spans overflow the candidate iscales;
    ggml's magic-number trick asserts/UB there, Candle's Rust cast
    saturates): NaN→0, ±inf/huge→saturate. Callers clamp afterwards, so
    any saturated value lands on their bound."""
    x = np.rint(np.asarray(x, dtype=_F32))
    x = np.nan_to_num(x, nan=0.0, posinf=float(2**62), neginf=-float(2**62))
    return np.clip(x, -float(2**62), float(2**62)).astype(np.int64)


def _round_away(x: np.ndarray) -> np.ndarray:
    """Rust f32::round: half away from zero (Q8_0 path only)."""
    x = x.astype(_F32)
    return np.trunc(x + np.copysign(_F32(0.5), x))


# ---------------------------------------------------------------------------
# Q8_0


def quantize_q8_0(weights, rows: int, cols: int) -> bytes:
    _check_cols("Q8_0", cols, QK8_0)
    blocks = _as_blocks(weights, rows, cols, QK8_0)
    amax = np.abs(blocks).max(axis=1)
    scale = np.where(amax > 0, amax / _F32(127.0), _F32(0.0)).astype(_F32)
    inv = np.divide(_F32(1.0), scale, out=np.zeros_like(scale),
                    where=scale != 0)
    # subnormal amax ⇒ inv overflows to inf and 0·inf = NaN; the reference
    # uses Rust's saturating float→int cast (NaN→0) + clamp (±inf→bounds)
    scaled = np.nan_to_num(_round_away(blocks * inv[:, None]),
                           nan=0.0, posinf=127.0, neginf=-128.0)
    q = np.clip(scaled, -128, 127).astype(np.int8)
    q[scale == 0] = 0
    out = np.zeros((len(blocks), Q8_0_BLOCK_BYTES), dtype=np.uint8)
    out[:, :2] = scale.astype("<f2").view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.tobytes()


def dequantize_q8_0(payload: bytes, rows: int, cols: int) -> np.ndarray:
    n_blocks = rows * (cols // QK8_0)
    raw = np.frombuffer(payload, dtype=np.uint8).reshape(n_blocks,
                                                         Q8_0_BLOCK_BYTES)
    scale = raw[:, :2].copy().view("<f2").astype(_F32).reshape(-1)
    q = raw[:, 2:].view(np.int8).astype(_F32)
    return (scale[:, None] * q).reshape(rows, cols)


# ---------------------------------------------------------------------------
# shared K-quant searches (vectorized across all sub-blocks at once)


def _make_qx_quants(X: np.ndarray, nmax: int) -> Tuple[np.ndarray,
                                                       np.ndarray]:
    """ggml make_qx_quants (rmse_type=1, x²-weighted): signed linear fit
    per sub-block. X: (N, n) float32 → (L (N, n) ints in [0, 2*nmax),
    scale (N,) float32)."""
    X = X.astype(_F32)
    ax = np.abs(X)
    amax = ax.max(axis=1)
    maxv = X[np.arange(len(X)), ax.argmax(axis=1)]
    dead = amax < GROUP_MAX_EPS
    safe_max = np.where(maxv != 0, maxv, _F32(1.0)).astype(_F32)
    W = X * X

    def trial(iscale):
        li = np.clip(_nearest_int(iscale[:, None] * X), -nmax, nmax - 1)
        lf = li.astype(_F32)
        sumlx = (W * X * lf).sum(axis=1, dtype=_F32)
        suml2 = (W * lf * lf).sum(axis=1, dtype=_F32)
        return li, sumlx, suml2

    iscale = (_F32(-nmax) / safe_max).astype(_F32)
    L, sumlx, suml2 = trial(iscale)
    scale = np.divide(sumlx, suml2, out=np.zeros_like(sumlx),
                      where=suml2 != 0)
    best = (scale * sumlx).astype(_F32)
    for step in range(-9, 10):
        if step == 0:
            continue
        isc = (-(_F32(nmax) + _F32(0.1) * _F32(step)) / safe_max).astype(_F32)
        l2, sl, s2 = trial(isc)
        better = (s2 > 0) & (sl * sl > best * s2)
        if better.any():
            L[better] = l2[better]
            ns = np.divide(sl, s2, out=np.zeros_like(sl), where=s2 != 0)
            scale = np.where(better, ns, scale).astype(_F32)
            best = np.where(better, ns * sl, best).astype(_F32)
    L = L + nmax
    L[dead] = 0
    scale = np.where(dead, _F32(0.0), scale).astype(_F32)
    return L, scale


def _make_qkx2_quants(X: np.ndarray, W: np.ndarray, nmax: int,
                      rmin: float, rdelta: float, nstep: int,
                      use_mad: bool = False):
    """ggml make_qkx2_quants: affine (scale, min) fit per sub-block with a
    grid of candidate scales + weighted LS refit. X, W: (N, n) float32 →
    (scale (N,), the_min (N,), L (N, n) ints in [0, nmax])."""
    X = X.astype(_F32)
    W = W.astype(_F32)
    mn = np.minimum(X.min(axis=1), _F32(0.0)).astype(_F32)
    mx = X.max(axis=1)
    sum_w = W.sum(axis=1, dtype=_F32)
    sum_x = (W * X).sum(axis=1, dtype=_F32)
    flat = mx == mn

    def span_of(cur_mn):
        # ggml updates `min` on every improvement, and later candidate
        # steps divide by the CURRENT (max - min) — recompute per step
        return np.where(flat, _F32(1.0), mx - cur_mn).astype(_F32)

    iscale = (_F32(nmax) / span_of(mn)).astype(_F32)
    scale = (_F32(1.0) / iscale).astype(_F32)
    L = np.clip(_nearest_int(iscale[:, None] * (X - mn[:, None])), 0, nmax)
    diff = scale[:, None] * L.astype(_F32) + mn[:, None] - X
    diff = np.abs(diff) if use_mad else diff * diff
    best_mad = (W * diff).sum(axis=1, dtype=_F32)

    for step in range(nstep + 1):
        isc = ((_F32(rmin) + _F32(rdelta) * _F32(step) + _F32(nmax))
               / span_of(mn)).astype(_F32)
        laux = np.clip(_nearest_int(isc[:, None] * (X - mn[:, None])),
                       0, nmax)
        lf = laux.astype(_F32)
        sum_l = (W * lf).sum(axis=1, dtype=_F32)
        sum_l2 = (W * lf * lf).sum(axis=1, dtype=_F32)
        sum_xl = (W * lf * X).sum(axis=1, dtype=_F32)
        D = (sum_w * sum_l2 - sum_l * sum_l).astype(_F32)
        ok = D > 0
        safe_D = np.where(ok, D, _F32(1.0))
        this_scale = ((sum_w * sum_xl - sum_x * sum_l) / safe_D).astype(_F32)
        this_min = ((sum_l2 * sum_x - sum_l * sum_xl) / safe_D).astype(_F32)
        pos = this_min > 0
        safe_l2 = np.where(sum_l2 != 0, sum_l2, _F32(1.0))
        this_scale = np.where(pos, (sum_xl / safe_l2).astype(_F32),
                              this_scale)
        this_min = np.where(pos, _F32(0.0), this_min)
        diff = this_scale[:, None] * lf + this_min[:, None] - X
        diff = np.abs(diff) if use_mad else diff * diff
        mad = (W * diff).sum(axis=1, dtype=_F32)
        better = ok & (mad < best_mad) & ~flat
        if better.any():
            L = np.where(better[:, None], laux, L)
            best_mad = np.where(better, mad, best_mad).astype(_F32)
            scale = np.where(better, this_scale, scale).astype(_F32)
            mn = np.where(better, this_min, mn).astype(_F32)
    scale = np.where(flat, _F32(0.0), scale).astype(_F32)
    L = np.where(flat[:, None], 0, L)
    # +0.0 canonicalizes -0.0 (an all-±zero sub-block's min sign depends
    # on reduction order; the f16 scale bytes must be deterministic)
    return scale, ((-mn) + _F32(0.0)).astype(_F32), L


# ---------------------------------------------------------------------------
# Q4_K


def _pack_k_scales(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """8 6-bit scales + 8 6-bit mins → the standard 12-byte K layout.
    ls, lm: (nb, 8) ints in [0, 63] → (nb, 12) uint8."""
    nb = len(ls)
    sb = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(8):
        if j < 4:
            sb[:, j] = ls[:, j]
            sb[:, j + 4] = lm[:, j]
        else:
            sb[:, j + 4] = (ls[:, j] & 0xF) | ((lm[:, j] & 0xF) << 4)
            sb[:, j - 4] |= (ls[:, j] >> 4) << 6
            sb[:, j] |= (lm[:, j] >> 4) << 6
    return sb


def _unpack_k_scales(sb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(nb, 12) uint8 → (sc (nb, 8), m (nb, 8)) ints (get_scale_min_k4)."""
    sc = np.zeros((len(sb), 8), dtype=np.int32)
    m = np.zeros((len(sb), 8), dtype=np.int32)
    for j in range(8):
        if j < 4:
            sc[:, j] = sb[:, j] & 63
            m[:, j] = sb[:, j + 4] & 63
        else:
            sc[:, j] = (sb[:, j + 4] & 0xF) | ((sb[:, j - 4] >> 6) << 4)
            m[:, j] = (sb[:, j + 4] >> 4) | ((sb[:, j] >> 6) << 4)
    return sc, m


def quantize_q4_k(weights, rows: int, cols: int) -> bytes:
    _check_cols("Q4_K", cols, QK_K)
    blocks = _as_blocks(weights, rows, cols, QK_K)
    nb = len(blocks)
    sub = blocks.reshape(nb, 8, 32)
    av_x = np.sqrt((sub * sub).sum(axis=2, dtype=_F32) / _F32(32.0))
    W = (av_x[:, :, None] + np.abs(sub)).astype(_F32)
    scales, mins, L0 = _make_qkx2_quants(
        sub.reshape(-1, 32), W.reshape(-1, 32), nmax=15,
        rmin=-1.0, rdelta=0.1, nstep=20, use_mad=False)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    L0 = L0.reshape(nb, 8, 32)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.divide(_F32(63.0), max_scale,
                          out=np.zeros(nb, dtype=_F32),
                          where=max_scale > 0)
    inv_min = np.divide(_F32(63.0), max_min, out=np.zeros(nb, dtype=_F32),
                        where=max_min > 0)
    ls = np.minimum(63, _nearest_int(inv_scale[:, None] * scales))
    lm = np.minimum(63, _nearest_int(inv_min[:, None] * mins))
    sb = _pack_k_scales(ls.astype(np.uint8), lm.astype(np.uint8))
    d16 = (max_scale / _F32(63.0) + _F32(0.0)).astype("<f2")
    dmin16 = (max_min / _F32(63.0) + _F32(0.0)).astype("<f2")
    # re-quantize with the DEQUANTIZED (f16-rounded) super-scales
    sc, m = _unpack_k_scales(sb)
    dd = (d16.astype(_F32)[:, None] * sc.astype(_F32)).astype(_F32)
    dm = (dmin16.astype(_F32)[:, None] * m.astype(_F32)).astype(_F32)
    safe_dd = np.where(dd != 0, dd, _F32(1.0))
    q = np.clip(_nearest_int((sub + dm[:, :, None]) / safe_dd[:, :, None]),
                0, 15)
    q = np.where((dd != 0)[:, :, None], q, L0)     # ggml: if (!d) continue
    Lb = q.reshape(nb, QK_K).astype(np.uint8)
    qs = np.zeros((nb, 128), dtype=np.uint8)
    for j in range(0, QK_K, 64):
        qs[:, j // 2:j // 2 + 32] = (Lb[:, j:j + 32]
                                     | (Lb[:, j + 32:j + 64] << 4))
    out = np.zeros((nb, Q4_K_BLOCK_BYTES), dtype=np.uint8)
    out[:, 0:2] = d16.view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = dmin16.view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = sb
    out[:, 16:] = qs
    return out.tobytes()


def dequantize_q4_k(payload: bytes, rows: int, cols: int) -> np.ndarray:
    n_blocks = rows * (cols // QK_K)
    raw = np.frombuffer(payload, dtype=np.uint8).reshape(n_blocks,
                                                         Q4_K_BLOCK_BYTES)
    d = raw[:, 0:2].copy().view("<f2").astype(_F32).reshape(-1)
    dmin = raw[:, 2:4].copy().view("<f2").astype(_F32).reshape(-1)
    sc, m = _unpack_k_scales(raw[:, 4:16])
    qs = raw[:, 16:]
    y = np.zeros((n_blocks, QK_K), dtype=_F32)
    for j in range(0, QK_K, 64):
        lo = (qs[:, j // 2:j // 2 + 32] & 0xF).astype(_F32)
        hi = (qs[:, j // 2:j // 2 + 32] >> 4).astype(_F32)
        i0, i1 = j // 32, j // 32 + 1
        y[:, j:j + 32] = (d * sc[:, i0].astype(_F32))[:, None] * lo \
            - (dmin * m[:, i0].astype(_F32))[:, None]
        y[:, j + 32:j + 64] = (d * sc[:, i1].astype(_F32))[:, None] * hi \
            - (dmin * m[:, i1].astype(_F32))[:, None]
    return y.reshape(rows, cols)


# ---------------------------------------------------------------------------
# Q6_K


def quantize_q6_k(weights, rows: int, cols: int) -> bytes:
    _check_cols("Q6_K", cols, QK_K)
    blocks = _as_blocks(weights, rows, cols, QK_K)
    nb = len(blocks)
    sub = blocks.reshape(nb, 16, 16)
    L0, scales = _make_qx_quants(sub.reshape(-1, 16), nmax=32)
    L0 = L0.reshape(nb, 16, 16)
    scales = scales.reshape(nb, 16)
    absmax = np.abs(scales).max(axis=1)
    max_scale = scales[np.arange(nb), np.abs(scales).argmax(axis=1)]
    dead = absmax < GROUP_MAX_EPS
    safe_ms = np.where(dead, _F32(1.0), max_scale).astype(_F32)
    iscale = (_F32(-128.0) / safe_ms).astype(_F32)
    d16 = (_F32(1.0) / iscale + _F32(0.0)).astype("<f2")
    sc8 = np.minimum(127, _nearest_int(iscale[:, None] * scales)) \
        .astype(np.int8)
    dd = (d16.astype(_F32)[:, None] * sc8.astype(_F32)).astype(_F32)
    safe_dd = np.where(dd != 0, dd, _F32(1.0))
    q = np.clip(_nearest_int(sub / safe_dd[:, :, None]), -32, 31) + 32
    q = np.where((dd != 0)[:, :, None], q, L0)     # ggml: if (!d) continue
    Lb = q.reshape(nb, QK_K).astype(np.uint8)
    ql = np.zeros((nb, 128), dtype=np.uint8)
    qh = np.zeros((nb, 64), dtype=np.uint8)
    for half in (0, 1):
        b = half * 128
        l1 = Lb[:, b:b + 32]
        l2 = Lb[:, b + 32:b + 64]
        l3 = Lb[:, b + 64:b + 96]
        l4 = Lb[:, b + 96:b + 128]
        ql[:, half * 64:half * 64 + 32] = (l1 & 0xF) | ((l3 & 0xF) << 4)
        ql[:, half * 64 + 32:half * 64 + 64] = (l2 & 0xF) | ((l4 & 0xF) << 4)
        qh[:, half * 32:half * 32 + 32] = ((l1 >> 4) | ((l2 >> 4) << 2)
                                           | ((l3 >> 4) << 4)
                                           | ((l4 >> 4) << 6))
    out = np.zeros((nb, Q6_K_BLOCK_BYTES), dtype=np.uint8)
    out[:, :128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = sc8.view(np.uint8)
    out[:, 208:210] = d16.view(np.uint8).reshape(nb, 2)
    if dead.any():                                  # ggml memsets the block
        out[dead] = 0
    return out.tobytes()


def dequantize_q6_k(payload: bytes, rows: int, cols: int) -> np.ndarray:
    n_blocks = rows * (cols // QK_K)
    raw = np.frombuffer(payload, dtype=np.uint8).reshape(n_blocks,
                                                         Q6_K_BLOCK_BYTES)
    ql = raw[:, :128]
    qh = raw[:, 128:192]
    sc = raw[:, 192:208].view(np.int8).astype(_F32)
    d = raw[:, 208:210].copy().view("<f2").astype(_F32).reshape(-1)
    y = np.zeros((n_blocks, QK_K), dtype=_F32)
    for half in (0, 1):
        b = half * 128
        qlh = ql[:, half * 64:half * 64 + 64]
        qhh = qh[:, half * 32:half * 32 + 32]
        q1 = ((qlh[:, :32] & 0xF) | ((qhh & 3) << 4)).astype(np.int32) - 32
        q2 = ((qlh[:, 32:] & 0xF)
              | (((qhh >> 2) & 3) << 4)).astype(np.int32) - 32
        q3 = ((qlh[:, :32] >> 4) | (((qhh >> 4) & 3) << 4)) \
            .astype(np.int32) - 32
        q4 = ((qlh[:, 32:] >> 4) | (((qhh >> 6) & 3) << 4)) \
            .astype(np.int32) - 32
        s = sc[:, half * 8:half * 8 + 8]
        # element l of each 32-run uses scale index l//16 within its pair
        sidx = np.arange(32) // 16
        for qv, soff in ((q1, 0), (q2, 2), (q3, 4), (q4, 6)):
            scale = s[:, soff + sidx]              # (nb, 32)
            y[:, b + soff * 16:b + soff * 16 + 32] = \
                d[:, None] * scale * qv.astype(_F32)
    return y.reshape(rows, cols)


def encode_bias(values) -> bytes:
    """encode_bias_values analogue: f32 little-endian bytes."""
    return np.asarray(values, dtype="<f4").tobytes()


def decode_bias(payload: bytes) -> np.ndarray:
    return np.frombuffer(payload, dtype="<f4").astype(np.float32)


QUANTIZERS = {"Q8_0": quantize_q8_0, "Q4_K": quantize_q4_k,
              "Q6_K": quantize_q6_k}
DEQUANTIZERS = {"Q8_0": dequantize_q8_0, "Q4_K": dequantize_q4_k,
                "Q6_K": dequantize_q6_k}
