"""Quantized-snapshot export job — the reference's batch data-processing
pipeline re-expressed Ray-Data-first.

Reference shape (crates/dsq-cli/src/main.rs:278-405): discover tensor
specs → parallel quantize (rayon chunks) → single validated artifact,
with per-tensor auto dtype fallback (select_dtype,
crates/dsq-cli/src/main.rs:953-999: Q6_K/Q4_K → Q8_0 when the input dim
doesn't divide the block, float payload when nothing aligns) and
ExportStats totals (exported / fallbacks / q_bytes / bias_bytes).

Here: ``ray.data.read_parquet`` over a tensor table (name, out_dim,
in_dim, weights, bias, dtype) → one vectorized ``map_batches`` quantize
stage (kernels in functions/quant.py, every block of every row in the
batch quantized by matrix ops) → an atomic partitioned-Parquet snapshot
(tmp dir + rename, per-row q_len validation, stats manifest) instead of
the DSQ binary container — the SURVEY §1.5 mapping (validated index +
zero-copy mmap → Parquet/Arrow).

Scale shape: tensors are independent rows — no shuffle anywhere; the
quantize stage is stateless task workers; the sink writes one part file
per output block so a 100 TB weight sweep streams. The same per-batch
kernel runs single-process on the oracle side (x_quantize_export /
quantize_export_sql — the thumbs_expected byte-identity discipline).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from ..functions import quant as Q

FLOAT_FALLBACK = "F32"
_CHAIN = {"Q4_K": "Q8_0", "Q6_K": "Q8_0"}
_BLOCK = {"Q8_0": Q.QK8_0, "Q4_K": Q.QK_K, "Q6_K": Q.QK_K}


def select_dtype(primary: str, in_dim: int) -> Tuple[str, Optional[str]]:
    """(selected dtype, fallback_from): walk the reference's fallback
    chain (Q6_K/Q4_K → Q8_0) until the block divides in_dim; fall back to
    the float payload when no quantized dtype aligns
    (crates/dsq-cli/src/main.rs:953-999 + the Float task-result arm)."""
    if primary == FLOAT_FALLBACK:
        return FLOAT_FALLBACK, None
    if primary not in _BLOCK:
        raise ValueError(f"unknown quant dtype {primary!r}")
    current = primary
    fallback_from = None
    while True:
        if in_dim > 0 and in_dim % _BLOCK[current] == 0:
            return current, fallback_from
        if fallback_from is None:
            fallback_from = current
        nxt = _CHAIN.get(current)
        if nxt is None:
            return FLOAT_FALLBACK, fallback_from
        current = nxt


def quantize_tensor_batch(t: pa.Table) -> pa.Table:
    """Per-batch export kernel (shared by the Ray stage and the
    single-process oracle builder — byte-identity discipline). Input rows:
    (name str, out_dim int64, in_dim int64, weights list<float>,
    bias list<float> | null, dtype str). Output adds q_dtype,
    fallback_from, q_len, payload, bias_payload, bias_len."""
    names = t["name"].to_pylist()
    out_dims = t["out_dim"].to_pylist()
    in_dims = t["in_dim"].to_pylist()
    dtypes = t["dtype"].to_pylist()
    weights = t["weights"].to_pylist()
    biases = t["bias"].to_pylist() if "bias" in t.column_names \
        else [None] * len(names)
    out = {"name": [], "out_dim": [], "in_dim": [], "q_dtype": [],
           "fallback_from": [], "q_len": [], "payload": [],
           "bias_payload": [], "bias_len": []}
    for name, rows, cols, primary, w, b in zip(names, out_dims, in_dims,
                                               dtypes, weights, biases):
        rows, cols = int(rows), int(cols)
        w = np.asarray(w, dtype=np.float32)
        if w.size != rows * cols:
            raise ValueError(f"tensor {name!r}: {w.size} values, expected "
                             f"{rows * cols}")
        if b is not None and len(b) != rows:
            raise ValueError(f"tensor {name!r}: bias len {len(b)} != "
                             f"out_dim {rows}")
        dtype, fb = select_dtype(primary, cols)
        if dtype == FLOAT_FALLBACK:
            payload = w.astype("<f4").tobytes()
        else:
            payload = Q.QUANTIZERS[dtype](w, rows, cols)
        bias_payload = Q.encode_bias(b) if b is not None else None
        out["name"].append(name)
        out["out_dim"].append(rows)
        out["in_dim"].append(cols)
        out["q_dtype"].append(dtype)
        out["fallback_from"].append(fb)
        out["q_len"].append(len(payload))
        out["payload"].append(payload)
        out["bias_payload"].append(bias_payload)
        out["bias_len"].append(len(bias_payload) if bias_payload else 0)
    return pa.table({
        "name": pa.array(out["name"], pa.string()),
        "out_dim": pa.array(out["out_dim"], pa.int64()),
        "in_dim": pa.array(out["in_dim"], pa.int64()),
        "q_dtype": pa.array(out["q_dtype"], pa.string()),
        "fallback_from": pa.array(out["fallback_from"], pa.string()),
        "q_len": pa.array(out["q_len"], pa.int64()),
        "payload": pa.array(out["payload"], pa.binary()),
        "bias_payload": pa.array(out["bias_payload"], pa.binary()),
        "bias_len": pa.array(out["bias_len"], pa.int64()),
    })


def _expected_q_len(dtype: str, rows: int, cols: int) -> int:
    if dtype == FLOAT_FALLBACK:
        return rows * cols * 4
    return Q.q_len(dtype, rows, cols)


def run_quantize_export(tensor_paths, out_dir: str,
                        primary: str = "Q6_K") -> dict:
    """The export job: read tensor shards → quantize stage (task workers,
    stateless) → atomic snapshot directory (write to ``<out>.tmp``, verify
    every row's q_len against the writer's validation rule, publish stats,
    then rename — a crashed run leaves no half-snapshot). Returns the
    ExportStats analogue {exported, fallbacks, q_bytes, bias_bytes,
    dtype_counts}."""
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    ds = ray.data.read_parquet(list(tensor_paths))

    def with_primary(t: pa.Table) -> pa.Table:
        if "dtype" not in t.column_names:
            t = t.append_column(
                "dtype", pa.array([primary] * t.num_rows, pa.string()))
        return quantize_tensor_batch(t)

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    quantized = ds.map_batches(with_primary, batch_format="pyarrow")
    quantized.write_parquet(tmp)

    stats = {"exported": 0, "fallbacks": 0, "q_bytes": 0, "bias_bytes": 0,
             "dtype_counts": {}}
    for name in sorted(os.listdir(tmp)):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(tmp, name),
                          columns=["out_dim", "in_dim", "q_dtype",
                                   "fallback_from", "q_len", "bias_len"])
        for r in t.to_pylist():
            expect = _expected_q_len(r["q_dtype"], r["out_dim"],
                                     r["in_dim"])
            if r["q_len"] != expect:
                raise ValueError(
                    f"snapshot validation: q_len {r['q_len']} != expected "
                    f"{expect} for {r['q_dtype']}")
            stats["exported"] += 1
            stats["fallbacks"] += int(r["fallback_from"] is not None)
            stats["q_bytes"] += r["q_len"]
            stats["bias_bytes"] += r["bias_len"]
            dc = stats["dtype_counts"]
            dc[r["q_dtype"]] = dc.get(r["q_dtype"], 0) + 1
    with open(os.path.join(tmp, "_stats.json"), "w") as f:
        json.dump(stats, f, sort_keys=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return stats


def load_tensor(snapshot_dir: str, name: str) -> dict:
    """Read one tensor back from a snapshot: metadata + dequantized f32
    weights (+ bias) — the DsqReader analogue."""
    import pyarrow.dataset as pads
    dataset = pads.dataset(snapshot_dir, format="parquet")
    t = dataset.to_table(filter=pads.field("name") == name)
    if t.num_rows != 1:
        raise KeyError(f"tensor {name!r}: {t.num_rows} matches")
    r = t.to_pylist()[0]
    rows, cols = r["out_dim"], r["in_dim"]
    if r["q_dtype"] == FLOAT_FALLBACK:
        w = np.frombuffer(r["payload"], dtype="<f4").reshape(rows, cols) \
            .astype(np.float32)
    else:
        w = Q.DEQUANTIZERS[r["q_dtype"]](r["payload"], rows, cols)
    bias = Q.decode_bias(r["bias_payload"]) \
        if r["bias_payload"] is not None else None
    return {"name": r["name"], "out_dim": rows, "in_dim": cols,
            "q_dtype": r["q_dtype"], "fallback_from": r["fallback_from"],
            "weights": w, "bias": bias}


# ---------------------------------------------------------------------------
# oracle-gated query over the sf embeddings table


QUANT_GROUP = 8          # embeddings per tensor row: 8 × 64 dims = 2 × 256
_QUANT_CYCLE = ["Q6_K", "Q4_K", "Q8_0"]


def build_tensor_table(sf_dir: str) -> pa.Table:
    """Deterministic tensor specs from the embeddings table: each group of
    8 consecutive vec_ids forms one (2 × 256) tensor; requested dtype
    cycles Q6_K/Q4_K/Q8_0; every 4th group re-shapes to (4 × 128) to
    exercise the Q8_0 auto-fallback and every 16th to (32 × 16) — 16 is
    not a multiple of any quant block, so those rows land on the F32
    float fallback; every 3rd tensor carries an f32 bias."""
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    order = pa.compute.sort_indices(t["vec_id"])
    t = t.take(order)
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    n_groups = len(vecs) // QUANT_GROUP
    names, out_dims, in_dims, weights, biases, dtypes = [], [], [], [], [], []
    for g in range(n_groups):
        flat = vecs[g * QUANT_GROUP:(g + 1) * QUANT_GROUP].reshape(-1)
        if g % 16 == 15:
            rows, cols = 32, len(flat) // 32        # 16: → F32 fallback
        elif g % 4 == 3:
            rows, cols = 4, len(flat) // 4          # 128: → Q8_0 fallback
        else:
            rows, cols = 2, len(flat) // 2          # 256: native K blocks
        names.append(f"layer.{g}.weight")
        out_dims.append(rows)
        in_dims.append(cols)
        weights.append(flat.tolist())
        biases.append(flat[:rows].tolist() if g % 3 == 0 else None)
        dtypes.append(_QUANT_CYCLE[g % len(_QUANT_CYCLE)])
    return pa.table({
        "name": pa.array(names, pa.string()),
        "out_dim": pa.array(out_dims, pa.int64()),
        "in_dim": pa.array(in_dims, pa.int64()),
        "weights": pa.array(weights, pa.list_(pa.float32())),
        "bias": pa.array(biases, pa.list_(pa.float32())),
        "dtype": pa.array(dtypes, pa.string()),
    })


def _fingerprint_quant(t: pa.Table) -> pa.Table:
    import hashlib
    md5s = [hashlib.md5(p).hexdigest() for p in t["payload"].to_pylist()]
    fb = [x if x is not None else "" for x in t["fallback_from"].to_pylist()]
    return pa.table({
        "name": t["name"], "out_dim": t["out_dim"], "in_dim": t["in_dim"],
        "q_dtype": t["q_dtype"],
        "fallback_from": pa.array(fb, pa.string()),
        "q_len": t["q_len"],
        "payload_md5": pa.array(md5s, pa.string()),
        "bias_len": t["bias_len"],
    })


def _ensure_quant_aux(sf_dir: str) -> None:
    from .corpus import _ensure_aux

    def build_inputs() -> pa.Table:
        return build_tensor_table(sf_dir)

    def build_expected() -> pa.Table:
        # single-process run of the SAME per-batch kernel over the same
        # inputs (thumbs_expected discipline)
        return _fingerprint_quant(quantize_tensor_batch(build_tensor_table(
            sf_dir)))

    extra = f"g={QUANT_GROUP},v2"
    _ensure_aux("quant_inputs.parquet", sf_dir, build_inputs, extra=extra)
    _ensure_aux("quant_expected.parquet", sf_dir, build_expected,
                extra=extra)


def quantize_export_sql(sf_dir: str) -> str:
    from .corpus import aux_dir_for
    return (f"SELECT name, out_dim, in_dim, q_dtype, fallback_from, q_len, "
            f"payload_md5, bias_len FROM read_parquet("
            f"'{aux_dir_for(sf_dir)}/quant_expected.parquet')")


def x_quantize_export(sf_dir: str):
    """G-family closer: the DSQ export's quantize math (Q8_0/Q4_K/Q6_K +
    auto fallback) as a distributed stage, fingerprint-oracled against the
    single-process run of the same kernel
    (crates/dsq-writer/src/lib.rs:555-664 semantics; job shape
    crates/dsq-cli/src/main.rs:278-405)."""
    import ray.data

    from .corpus import aux_dir_for
    _ensure_quant_aux(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(aux_dir_for(sf_dir), "quant_inputs.parquet"))
    return (ds.map_batches(quantize_tensor_batch, batch_format="pyarrow",
                           batch_size=64)
            .map_batches(_fingerprint_quant, batch_format="pyarrow"))
