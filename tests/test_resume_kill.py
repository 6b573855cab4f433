"""Hard kill/resume: SIGKILL a mid-flight job subprocess, resume, and
require byte-identical complete output (FIXTURES.md §5)."""

import glob
import os
import signal
import subprocess
import sys
import time

import pytest

from deepseek_ocr_rs_ray.fixtures.pages import generate_pages_parquet, pages_table
from deepseek_ocr_rs_ray.oracle import oracle_extract_pages
from deepseek_ocr_rs_ray.pipelines.extract import read_output, run_extract_job
from deepseek_ocr_rs_ray.state import manifest as mf

N = 120

_JOB = """
import sys
sys.path.insert(0, {repo!r})
import glob
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from deepseek_ocr_rs_ray.pipelines.extract import run_extract_job
run_extract_job(sorted(glob.glob(sys.argv[1] + "/*.parquet")), sys.argv[2],
                wave_size=1)
ray.shutdown()
"""


@pytest.mark.timeout(600)
def test_sigkill_mid_job_then_resume(ray_session, tmp_path):
    pages_dir = str(tmp_path / "pages")
    generate_pages_parquet(pages_dir, N, rows_per_shard=20)   # 6 waves
    out = str(tmp_path / "out")

    script = str(tmp_path / "job.py")
    with open(script, "w") as f:
        f.write(_JOB.format(repo=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))))

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    # one relaunch: under heavy suite load the subprocess's own ray.init
    # can die at startup before any wave commits — that's infra noise, not
    # the resume contract under test
    for _attempt in range(2):
        proc = subprocess.Popen([sys.executable, script, pages_dir, out],
                                env=env, stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        # wait until at least one wave committed (or the job finishes early)
        deadline = time.time() + 240
        while time.time() < deadline:
            if len(mf.committed_waves(out)) >= 1 or proc.poll() is not None:
                break
            time.sleep(0.25)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)   # hard kill, no cleanup
            proc.wait()
        committed_before = mf.committed_waves(out)
        if committed_before or proc.returncode == 0:
            break
    assert committed_before or proc.returncode == 0

    # resume in this session: must skip committed waves, redo the rest
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    summary = run_extract_job(files, out, wave_size=1)
    assert summary["waves_skipped"] == len(committed_before)
    assert summary["waves_run"] == 6 - len(committed_before)

    res = read_output(out).to_pandas().sort_values("url").reset_index(drop=True)
    gold = (oracle_extract_pages(pages_table(N))
            .to_pandas().sort_values("url").reset_index(drop=True))
    assert len(res) == N
    assert (res["extracted_text"].values == gold["extracted_text"].values).all()
    assert (res["method"].values == gold["method"].values).all()
