"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "extract": {"rows": R, "ocr_rows": K, "sec": S, "docs_per_sec": D}}

--scaling: runs the extraction headline twice in fresh processes
(RAY_GRAFT_CPUS=8 and =32) on the same input and reports both throughputs
plus scaling efficiency (the north rule's two-cluster-size criterion in
its sandbox form).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "20000"))

# queries timed in the main bench (a representative slice of the catalogue)
BENCH_QUERIES = [
    "q1_pricing_summary", "q3_top_orders", "q5_local_supplier_volume",
    "q_filter_project", "q_topk_orders", "q_orders_by_month",
    "q_events_hourly", "q_events_sessionize", "q_asof_last_order",
    "q_dedup_exact", "q_token_stats", "q_minhash_pairs",
    "q_knn_cosine", "q_embed_dup_pairs",
]


def _consume(res) -> int:
    import ray.data
    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    return len(res)


def _warm_cache(paths):
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass


def run_extract_bench() -> dict:
    """The headline: resumable extraction job over the bench pages fixture."""
    from deepseek_ocr_rs_ray.fixtures.pages import pages_fixture_dir
    from deepseek_ocr_rs_ray.pipelines.extract import run_extract_job

    d = pages_fixture_dir(BENCH_PAGES, root="/tmp/dsocr_bench")  # cached, untimed
    files = sorted(glob.glob(d + "/*.parquet"))
    _warm_cache(files)
    out = f"/tmp/dsocr_bench/out_{NUM_CPUS}"
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.perf_counter()
    s = run_extract_job(files, out, wave_size=len(files))
    sec = time.perf_counter() - t0
    return {"rows": s["rows"], "ocr_rows": s["ocr_rows"], "sec": round(sec, 3),
            "docs_per_sec": round(s["rows"] / sec, 1)}


def main() -> None:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    qs = entrymod.queries()

    _warm_cache(sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))))

    timings = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        _consume(qs[name](SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    extract = run_extract_bench()
    timings["x_extract_pages"] = extract["sec"]

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "extraction+ops wall seconds (docs/sec in extract.docs_per_sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "extract": extract,
    }))
    ray.shutdown()


def scaling() -> None:
    """Same job at two parallelism levels in fresh processes."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    lo, hi = results[8]["extract"], results[32]["extract"]
    eff = (lo["sec"] / hi["sec"]) / (32 / 8)
    print(json.dumps({
        "metric": "extraction docs/sec scaling, 8 -> 32 CPUs",
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "sec_8": lo["sec"], "sec_32": hi["sec"],
        "scaling_efficiency": round(eff, 3),
        "total_sec_8": results[8]["value"], "total_sec_32": results[32]["value"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
