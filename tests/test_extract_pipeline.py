"""The strict gate: Ray pipeline output must be byte-identical per url to the
single-process oracle at any parallelism / partitioning, and the job must be
resumable (kill → rerun → identical complete output). Analogue of the
reference's rust-vs-python strict compare (benchsuite/orchestrator.py:456-521)."""

import glob
import os
import shutil

import pytest

from deepseek_ocr_rs_ray.fixtures.pages import generate_pages_parquet, pages_table
from deepseek_ocr_rs_ray.oracle import oracle_extract_pages
from deepseek_ocr_rs_ray.pipelines.extract import (
    build_extract_dataset, read_output, run_extract_job)
from deepseek_ocr_rs_ray.state import manifest as mf

N_ROWS = 160
FIXTURE = "/tmp/dsocr_test_pages_160"
FIXTURE_WIDE = "/tmp/dsocr_test_pages_160_wide"


@pytest.fixture(scope="module")
def pages_dir(ray_session):
    shutil.rmtree(FIXTURE, ignore_errors=True)
    generate_pages_parquet(FIXTURE, N_ROWS, rows_per_shard=40)   # 4 shards
    return FIXTURE


@pytest.fixture(scope="module")
def golden():
    return (oracle_extract_pages(pages_table(N_ROWS))
            .to_pandas().sort_values("url").reset_index(drop=True))


def _norm(df):
    df = df.sort_values("url").reset_index(drop=True)
    df["spans"] = df["spans"].map(lambda s: [(d["start"], d["end"]) for d in s])
    return df


def assert_matches_golden(df, golden):
    from deepseek_ocr_rs_ray.functions.conformance import strict_compare_rows
    df = _norm(df)
    golden = _norm(golden.copy())
    assert len(df) == len(golden)
    assert (df["url"].values == golden["url"].values).all()
    n_bad, reports = strict_compare_rows(df["url"].tolist(),
                                         df["extracted_text"].tolist(),
                                         golden["extracted_text"].tolist())
    assert n_bad == 0, "earliest divergences:\n" + "\n".join(reports[:5])
    assert (df["method"].values == golden["method"].values).all()
    assert (df["n_tiles"].values == golden["n_tiles"].values).all()
    assert df["spans"].tolist() == golden["spans"].tolist()


def test_dataset_matches_oracle(ray_session, pages_dir, golden):
    ds = build_extract_dataset(sorted(glob.glob(pages_dir + "/*.parquet")))
    assert_matches_golden(ds.to_pandas(), golden)


def test_stage_modes_byte_identical(ray_session, pages_dir, golden, monkeypatch):
    """Every stage-mode (tasks default, fused actor pool, unfused split)
    produces byte-identical output — the actor-pool path stays first-class
    and covered even though `tasks` is the measured-default (extract.py
    mode comment / BASELINE.md round-3 A/B)."""
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    for mode in ("fused", "split"):
        monkeypatch.setenv("GRAFT_EXTRACT_MODE", mode)
        ds = build_extract_dataset(files)
        assert_matches_golden(ds.to_pandas(), golden)


def test_partitioning_invariance(ray_session, golden):
    """Different shard layout + batch size → identical bytes."""
    shutil.rmtree(FIXTURE_WIDE, ignore_errors=True)
    generate_pages_parquet(FIXTURE_WIDE, N_ROWS, rows_per_shard=13)  # 13 shards
    from deepseek_ocr_rs_ray.config import ExtractConfig
    cfg = ExtractConfig(dom_batch_size=7, ocr_batch_size=2, ocr_concurrency=2)
    ds = build_extract_dataset(sorted(glob.glob(FIXTURE_WIDE + "/*.parquet")), cfg)
    assert_matches_golden(ds.to_pandas(), golden)


def test_job_resume_and_idempotence(ray_session, pages_dir, golden, tmp_path):
    out = str(tmp_path / "out")
    files = sorted(glob.glob(pages_dir + "/*.parquet"))

    # partial run = kill after first wave
    s1 = run_extract_job(files, out, wave_size=1, max_waves=1)
    assert s1["waves_run"] == 1

    # torn tmp dir from the "crash"
    os.makedirs(os.path.join(out, ".tmp-wave-00002"), exist_ok=True)
    # published-but-uncommitted wave: simulate a kill between commit_wave's
    # data rename and its manifest write (ADVICE r01) — stale data under
    # wave=00001 with NO manifest must be swept + re-run, not leaked/crashed
    stale = os.path.join(out, "wave=00001", "sc=0")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "part-stale.parquet"), "wb") as f:
        f.write(b"not a parquet")

    s2 = run_extract_job(files, out, wave_size=1)
    assert s2["waves_skipped"] == 1 and s2["waves_run"] == 3
    assert not any(n.startswith(".tmp") for n in os.listdir(out))
    assert not os.path.exists(os.path.join(stale, "part-stale.parquet"))

    assert_matches_golden(read_output(out).to_pandas(), golden)

    # idempotent rerun
    s3 = run_extract_job(files, out, wave_size=1)
    assert s3["waves_run"] == 0 and s3["waves_skipped"] == 4

    # manifest sanity: counts add up, all committed
    m = mf.read_manifest(out).to_pandas()
    assert set(m["status"]) == {"committed"}
    assert m["row_count"].sum() == N_ROWS
    assert m["ocr_rows"].sum() == int((golden["method"] == "ocr").sum())
    assert (m["content_hash"].str.len() == 32).all()


def test_wave_size_does_not_change_bytes(ray_session, pages_dir, golden, tmp_path):
    out = str(tmp_path / "out2")
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    run_extract_job(files, out, wave_size=3)
    assert_matches_golden(read_output(out).to_pandas(), golden)


def test_wave_overlap(ray_session, pages_dir, golden, tmp_path):
    """overlap=2 (two wave executions in flight) commits all waves, stays
    byte-identical to the sequential path, and resumes cleanly on top of a
    partial overlapped run."""
    out = str(tmp_path / "out_ovl")
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    s = run_extract_job(files, out, wave_size=1, overlap=2)
    assert s["waves_run"] == 4 and s["rows"] == N_ROWS
    assert_matches_golden(read_output(out).to_pandas(), golden)

    # partial overlapped run (2 of 4 waves), then an overlapped resume
    out2 = str(tmp_path / "out_ovl2")
    s1 = run_extract_job(files, out2, wave_size=1, max_waves=2, overlap=2)
    assert s1["waves_run"] == 2
    s2 = run_extract_job(files, out2, wave_size=1, overlap=2)
    assert s2["waves_skipped"] == 2 and s2["waves_run"] == 2
    assert_matches_golden(read_output(out2).to_pandas(), golden)
    m = mf.read_manifest(out2).to_pandas()
    assert set(m["status"]) == {"committed"}
    assert m["row_count"].sum() == N_ROWS


def test_sampled_decode_in_pipeline(ray_session, pages_dir, golden):
    """T3 in-pipeline: seeded sampled decode (do_sample + temperature +
    top_k) is deterministic at any parallelism, byte-identical to the
    single-process oracle, and actually differs from the greedy output."""
    from deepseek_ocr_rs_ray.config import DecodeParameters, ExtractConfig
    from deepseek_ocr_rs_ray.fixtures.pages import pages_table
    cfg = ExtractConfig(decode=DecodeParameters(
        do_sample=True, temperature=3.0, top_k=8, seed=7))
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    df = (build_extract_dataset(files, cfg).to_pandas()
          .sort_values("url").reset_index(drop=True))
    g = (oracle_extract_pages(pages_table(N_ROWS), cfg)
         .to_pandas().sort_values("url").reset_index(drop=True))
    assert (df["url"].values == g["url"].values).all()
    assert (df["extracted_text"].values == g["extracted_text"].values).all()
    # sampling must change at least one OCR row vs the greedy golden
    greedy = golden.sort_values("url").reset_index(drop=True)
    ocr = (df["method"] == "ocr").values
    assert (df.loc[ocr, "extracted_text"].values
            != greedy.loc[ocr, "extracted_text"].values).any()


def test_metrics_written(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out3")
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    run_extract_job(files, out, wave_size=4)
    import pyarrow.parquet as pq
    metrics = pq.read_table(glob.glob(out + "/_metrics/*.parquet")[0]).to_pandas()
    assert set(metrics["stage"]) == {"dom", "ocr"}
    dom = metrics[metrics["stage"] == "dom"].iloc[0]
    assert dom["count"] == N_ROWS and dom["total_ms"] > 0
