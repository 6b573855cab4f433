"""Validated pages source + golden/bench sinks.

Reference parity (SURVEY.md §2.1):

- S5 (DSQ container reader — validated header + typed records,
  crates/dsq/src/lib.rs:208-391): ``read_pages`` validates the input_hint
  schema at pipeline entry before any work is scheduled, and rejects
  unknown/missing/mistyped columns with a precise error, the analogue of
  the DSQ reader's magic/version/record validation.
- S2 (data-URL image loader, crates/server/src/generation.rs:284-298):
  ``decode_payload_column`` — base64/binary payloads decoded inside
  ``map_batches``; invalid payloads are rejected per-row, not per-job.
- K3 (debug/golden JSON writer, crates/cli/src/app.rs:255-289):
  ``write_golden`` — full-provenance golden records for conformance runs.
- K2 (bench report writer, crates/cli/src/bench.rs:200-249):
  ``write_bench_report`` — grouped stage totals to JSON.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

from ..fixtures.pages import PAGES_SCHEMA

_EXPECTED = {f.name: f.type for f in PAGES_SCHEMA}


class SchemaError(ValueError):
    pass


def validate_pages_schema(schema: pa.Schema, require_all: bool = True) -> None:
    """Reject wrong shapes before scheduling work (S5 discipline)."""
    names = set(schema.names)
    missing = [n for n in _EXPECTED if n not in names]
    if require_all and missing:
        raise SchemaError(f"pages table missing columns: {missing}")
    for name in schema.names:
        if name in _EXPECTED and schema.field(name).type != _EXPECTED[name]:
            raise SchemaError(
                f"pages column {name!r} has type {schema.field(name).type}, "
                f"expected {_EXPECTED[name]}")


def read_pages(paths: Sequence[str], columns: Optional[Sequence[str]] = None,
               num_blocks: Optional[int] = None):
    """Schema-validated ray.data source for the pages table.

    ``num_blocks`` (override_num_blocks) controls map-task granularity
    downstream: page costs are heavy-tailed (2 MB pages, dense OCR scans),
    so the default ~200 blocks leaves a skew tail where a few actors finish
    last with multi-second blocks; callers size it to ~8 blocks per CPU
    (extract.py GRAFT_BLOCKS_PER_CPU default).
    """
    import ray.data
    paths = sorted(paths)
    if not paths:
        raise SchemaError("no input files")
    validate_pages_schema(pq.read_schema(paths[0]))
    return ray.data.read_parquet(list(paths),
                                 columns=list(columns) if columns else None,
                                 override_num_blocks=num_blocks)


def decode_payload_column(batch: pa.Table, column: str = "payload",
                          b64: bool = False) -> pa.Table:
    """Per-row payload decode with per-row rejection (S2 semantics):
    adds ``<column>_ok`` (bool) and ``<column>_meta`` (struct) columns."""
    import base64

    from ..functions.raster import payload_meta
    ok: List[bool] = []
    metas: List[Optional[dict]] = []
    for raw in batch.column(column).to_pylist():
        if raw is None:
            ok.append(False)
            metas.append(None)
            continue
        data = raw
        if b64:
            try:
                data = base64.b64decode(raw, validate=True)
            except Exception:
                ok.append(False)
                metas.append(None)
                continue
        meta = payload_meta(data)
        ok.append(meta is not None)
        metas.append(meta if meta is None else
                     {k: meta[k] for k in ("width", "height", "glyph_scale")})
    meta_type = pa.struct([("width", pa.int64()), ("height", pa.int64()),
                           ("glyph_scale", pa.int64())])
    return (batch.append_column(f"{column}_ok", pa.array(ok, pa.bool_()))
                 .append_column(f"{column}_meta", pa.array(metas, meta_type)))


def write_golden(rows: pa.Table, path: str) -> str:
    """Golden conformance fixture writer (K3): parquet + sidecar JSON with
    row count and schema for quick diffing."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(rows, path + ".tmp")
    os.replace(path + ".tmp", path)
    sidecar = {
        "rows": rows.num_rows,
        "columns": rows.schema.names,
        "types": [str(t) for t in rows.schema.types],
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2, sort_keys=True)
    return path


def write_bench_report(stage_rows: List[dict], path: str) -> str:
    """Bench JSON report (K2): events grouped by stage with
    count/total/min/max/avg — crates/cli/src/bench.rs:139-249 semantics."""
    stages: dict = {}
    for r in stage_rows:
        s = stages.setdefault(r["stage"], {"count": 0, "total_ms": 0.0,
                                           "min_ms": None, "max_ms": None})
        s["count"] += int(r.get("count", 1))
        ms = float(r["total_ms"])
        s["total_ms"] += ms
        s["min_ms"] = ms if s["min_ms"] is None else min(s["min_ms"], ms)
        s["max_ms"] = ms if s["max_ms"] is None else max(s["max_ms"], ms)
    for s in stages.values():
        s["avg_ms"] = s["total_ms"] / s["count"] if s["count"] else 0.0
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".tmp", "w") as f:
        json.dump({"stages": stages}, f, indent=2, sort_keys=True)
    os.replace(path + ".tmp", path)
    return path
