"""Validated pages source + golden/bench sinks (S5/S2/K2/K3 analogues)."""

import base64
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deepseek_ocr_rs_ray.fixtures.pages import pages_table
from deepseek_ocr_rs_ray.functions.raster import encode_payload
from deepseek_ocr_rs_ray.sources import pages as S


def test_validate_schema_accepts_fixture():
    S.validate_pages_schema(pages_table(2).schema)


def test_validate_schema_rejects_missing_and_mistyped(tmp_path):
    bad = pa.table({"url": pa.array(["x"]), "html": pa.array([b"y"], pa.binary())})
    with pytest.raises(S.SchemaError, match="missing"):
        S.validate_pages_schema(bad.schema)
    mistyped = pa.table({
        "url": pa.array([1]),  # int, not string
        "warc_ts": pages_table(1).column("warc_ts"),
        "html": pa.array([b"y"], pa.binary()),
        "text": pa.array(["t"]),
        "lang": pa.array(["en"]),
    })
    with pytest.raises(S.SchemaError, match="url"):
        S.validate_pages_schema(mistyped.schema)


def test_read_pages_validates_before_scheduling(ray_session, tmp_path):
    good = str(tmp_path / "good.parquet")
    pq.write_table(pages_table(5), good)
    assert S.read_pages([good]).count() == 5

    bad = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"url": pa.array(["x"])}), bad)
    with pytest.raises(S.SchemaError):
        S.read_pages([bad])
    with pytest.raises(S.SchemaError):
        S.read_pages([])


def test_decode_payload_column_per_row_rejection():
    import numpy as np
    ok_payload = encode_payload(np.zeros((4, 4, 3), dtype=np.uint8), 2, 1)
    batch = pa.table({
        "payload": pa.array([ok_payload, b"junk", None], pa.binary()),
    })
    out = S.decode_payload_column(batch)
    assert out.column("payload_ok").to_pylist() == [True, False, False]
    meta = out.column("payload_meta").to_pylist()
    assert meta[0] == {"width": 4, "height": 4, "glyph_scale": 2}
    assert meta[1] is None

    b64batch = pa.table({"payload": pa.array(
        [base64.b64encode(ok_payload).decode(), "!!!not-b64!!!"], pa.string())})
    out2 = S.decode_payload_column(b64batch, b64=True)
    assert out2.column("payload_ok").to_pylist() == [True, False]


def test_write_golden_sidecar(tmp_path):
    t = pages_table(3).select(["url", "lang"])
    path = S.write_golden(t, str(tmp_path / "golden.parquet"))
    assert pq.read_table(path).equals(t)
    side = json.load(open(path + ".json"))
    assert side["rows"] == 3 and side["columns"] == ["url", "lang"]


def test_write_bench_report_stage_totals(tmp_path):
    rows = [{"stage": "dom", "count": 10, "total_ms": 5.0},
            {"stage": "dom", "count": 10, "total_ms": 7.0},
            {"stage": "ocr", "count": 1, "total_ms": 100.0}]
    path = S.write_bench_report(rows, str(tmp_path / "bench.json"))
    rep = json.load(open(path))["stages"]
    assert rep["dom"]["count"] == 20 and rep["dom"]["total_ms"] == 12.0
    assert rep["dom"]["min_ms"] == 5.0 and rep["dom"]["max_ms"] == 7.0
    assert rep["dom"]["avg_ms"] == 12.0 / 20
    assert rep["ocr"]["count"] == 1
