"""The flagship extraction pipeline (SURVEY.md §7.1):

    read_parquet(pages)                         # url, warc_ts, html, lang
      → map_batches(DomExtract)                 # boilerplate strip, routing,
                                                #   size-class tagging; html dropped
      → map_batches(OcrDecode)                  # stateful stage, 5% of rows
                                                #   (task workers by default,
                                                #   actor pool via
                                                #   GRAFT_EXTRACT_MODE=fused)
      → shard sink                              # partitioned parquet + counters

Scale notes (the 100 TB story):

- ``text`` is pruned at the read (only url/warc_ts/html/lang leave storage).
- No all-to-all shuffle anywhere: routing is pass-through (the wide ``html``
  column dies at the DOM stage, so OCR-pending payloads riding along cost
  almost nothing), size classes come from a driver-side deterministic sample
  rather than a global sort, and output partitioning happens inside the sink
  tasks. The only materialized result per wave is a handful of counter rows.
- Resumability: input files are processed in waves; each wave is one
  pipeline execution committed atomically (state/manifest.py). A killed run
  re-runs only uncommitted waves and reproduces byte-identical output.
"""

from __future__ import annotations

import hashlib
import os
import threading
import uuid
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import ExtractConfig
from ..stages.dom import DomExtract
from ..stages.ocr import OcrDecode
from ..state import manifest as mf

OUTPUT_COLUMNS = ["url", "warc_ts", "lang", "html_bytes", "size_class",
                  "extracted_text", "spans", "method", "n_tiles"]


def compute_size_cuts(paths: Sequence[str], cfg: ExtractConfig) -> List[int]:
    """Deterministic byte-length quantile cuts from a bounded sample.

    Reads the first row groups of the lexically-first input files on the
    driver (no Ray pass over the data) until ``size_sample_rows`` rows are
    seen — deterministic across resumes, cheap at any corpus size. Returns
    ``size_classes - 1`` ascending cut points.
    """
    lengths: List[int] = []
    for path in sorted(paths):
        pf = pq.ParquetFile(path)
        for batch in pf.iter_batches(batch_size=2048, columns=["html"]):
            col = batch.column(0)
            lengths.extend(len(v) for v in col.to_pylist())
            if len(lengths) >= cfg.size_sample_rows:
                break
        if len(lengths) >= cfg.size_sample_rows:
            break
    if not lengths:
        return [0] * (cfg.size_classes - 1)
    arr = np.sort(np.asarray(lengths[:cfg.size_sample_rows], dtype=np.int64))
    qs = [(i + 1) / cfg.size_classes for i in range(cfg.size_classes - 1)]
    return [int(arr[min(int(q * len(arr)), len(arr) - 1)]) for q in qs]


def build_extract_dataset(paths: Sequence[str], cfg: ExtractConfig = ExtractConfig(),
                          size_cuts: Optional[Sequence[int]] = None,
                          ocr_concurrency: Optional[int] = None):
    """Lazy Dataset of extraction results (no sink attached)."""
    import ray.data

    from ..sources.pages import read_pages
    # read_pages validates the schema at entry; build it first so a
    # malformed input fails with a precise SchemaError before the size-cut
    # sampling touches any data. Block count targets ~8 blocks/CPU
    # (GRAFT_BLOCKS_PER_CPU; measured best on this host) so the
    # heavy-tailed page costs balance across the pool without a skew tail.
    total_cpus_hint = int(ray.cluster_resources().get("CPU", 4))
    bpc = int(os.environ.get("GRAFT_BLOCKS_PER_CPU", "8"))
    nb = max(64, bpc * total_cpus_hint) if bpc > 0 else None
    ds = read_pages(paths, columns=["url", "warc_ts", "html", "lang"],
                    num_blocks=nb)
    if size_cuts is None:
        size_cuts = compute_size_cuts(paths, cfg)
    # Stage-mode knob (A/B measured; BASELINE.md round-3 records the runs):
    #   tasks (default) — both stages run as ordinary tasks (no actor
    #     pool): Ray reuses worker processes, so per-worker state (font
    #     table, compiled regexes, resample-coefficient cache) persists via
    #     module/instance state exactly like an actor would hold it, but the
    #     ~3 s pool-spawn cost leaves the cold path AND is not re-paid per
    #     wave (each wave is its own Dataset execution — an actor-pool
    #     stage respawns its pool every wave). Measured: cold 20k-page job
    #     2 179–2 601 docs/s vs 1 521–1 849 fused; 480k steady-state tie
    #     (14.8k vs 14.5k).
    #   fused — DOM fuses into the OCR actor pool (one ActorPoolMapOperator
    #     carries ~all map work). The right shape when per-worker state is
    #     genuinely heavy (real model weights that must load exactly once
    #     per process and pin memory) — kept first-class and tested.
    #   split — DOM runs as unfused tasks over every free CPU (a num_cpus
    #     request different from the pool's blocks operator fusion), OCR
    #     stays an actor pool.
    mode = os.environ.get("GRAFT_EXTRACT_MODE", "tasks")
    dom_kwargs = {}
    if cfg.dom_num_cpus is not None:
        dom_kwargs["num_cpus"] = cfg.dom_num_cpus
    elif mode == "split":
        dom_kwargs["num_cpus"] = 0.99
    ds = ds.map_batches(DomExtract(cfg, size_cuts), batch_format="pyarrow",
                        batch_size=cfg.dom_batch_size, **dom_kwargs)
    if mode == "tasks":
        ds = ds.map_batches(OcrDecode(cfg), batch_format="pyarrow",
                            batch_size=cfg.ocr_batch_size)
        return ds
    conc = ocr_concurrency if ocr_concurrency is not None else cfg.ocr_concurrency
    # Pool sizing: the map stage (DOM+OCR fused into the pool) carries the
    # overwhelming share of the work, so the pool takes every slot except a
    # small reserve for the read + sink task stages (parquet decode, zstd
    # encode) — a pool holding EVERY CPU deadlocks the executor, and one
    # starving the reserve serializes the sink tail. Reserve ≈12% of slots,
    # clamped to [1, 4]: at 32 CPUs → 28 actors + 4 task slots (measured
    # +~40% docs/s over the old 60% pool), at 8 → 7+1, at 4 → 3+1.
    import math
    total_cpus = int(ray.cluster_resources().get("CPU", 4))
    slots = total_cpus / max(cfg.ocr_num_cpus, 0.25)
    if slots < 3:
        # tiny session: an actor pool cannot coexist with 1-CPU read/sink
        # tasks without starving something — run the stage as ordinary
        # tasks instead (same callable, state rebuilt per worker; workers
        # are reused so module-level state persists)
        ds = ds.map_batches(OcrDecode(cfg), batch_format="pyarrow",
                            batch_size=cfg.ocr_batch_size)
        return ds
    reserve = min(4, max(1, math.ceil(slots * 0.12)))
    cap = max(1, int(slots) - reserve)
    if mode == "split":
        # unfused: the pool only carries the OCR share of the work (~26% of
        # kernel time on the bench mix); DOM tasks take the rest of the node
        cap = max(1, int(slots * 0.3))
    conc = cap if conc is None else max(1, min(conc, cap))
    # fixed-size pool, NOT an autoscaling (1, conc) range: the autoscaler
    # ramps far too slowly for a throughput job (measured 5.4k vs 9.4k
    # docs/s at 32 CPUs on the same input)
    ds = ds.map_batches(OcrDecode, fn_constructor_args=(cfg,),
                        batch_format="pyarrow", batch_size=cfg.ocr_batch_size,
                        concurrency=conc, num_cpus=cfg.ocr_num_cpus)
    return ds


def _row_hash_xor(urls: List[str], texts: List[str]) -> int:
    """Order-independent 128-bit content hash: XOR of per-row md5(url\\0text)."""
    acc = 0
    for u, t in zip(urls, texts):
        digest = hashlib.md5(u.encode() + b"\x00" + t.encode()).digest()
        acc ^= int.from_bytes(digest, "big")
    return acc


class ShardSink:
    """Write each batch as per-size-class parquet shards; return counters.

    The sink runs inside the Ray tasks (streaming, no driver funnel); the
    only thing the driver materializes is one small counter row per
    (batch, size_class).
    """

    def __init__(self, tmp_dir: str) -> None:
        self.tmp_dir = tmp_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = {"size_class": [], "row_count": [], "ocr_rows": [],
                    "output_bytes": [], "hash_hi": [], "hash_lo": [],
                    "dom_ms": [], "ocr_ms": []}
        sc_arr = batch.column("size_class").to_numpy(zero_copy_only=False)
        for sc in np.unique(sc_arr):
            mask = sc_arr == sc
            sub = batch.filter(pa.array(mask))
            data = sub.select(OUTPUT_COLUMNS)
            subdir = os.path.join(self.tmp_dir, f"sc={int(sc)}")
            os.makedirs(subdir, exist_ok=True)
            fname = os.path.join(subdir, f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(data, fname, compression="zstd")

            urls = sub.column("url").to_pylist()
            texts = sub.column("extracted_text").to_pylist()
            h = _row_hash_xor(urls, texts)
            methods = sub.column("method").to_pylist()
            out_rows["size_class"].append(int(sc))
            out_rows["row_count"].append(sub.num_rows)
            out_rows["ocr_rows"].append(sum(1 for m in methods if m == "ocr"))
            out_rows["output_bytes"].append(os.path.getsize(fname))
            out_rows["hash_hi"].append(h >> 64)
            out_rows["hash_lo"].append(h & ((1 << 64) - 1))
            out_rows["dom_ms"].append(float(pa.compute.sum(sub.column("dom_ms")).as_py() or 0.0))
            out_rows["ocr_ms"].append(float(pa.compute.sum(sub.column("ocr_ms")).as_py() or 0.0))
        return pa.table({
            "size_class": pa.array(out_rows["size_class"], pa.int32()),
            "row_count": pa.array(out_rows["row_count"], pa.int64()),
            "ocr_rows": pa.array(out_rows["ocr_rows"], pa.int64()),
            "output_bytes": pa.array(out_rows["output_bytes"], pa.int64()),
            "hash_hi": pa.array([v & ((1 << 64) - 1) for v in out_rows["hash_hi"]], pa.uint64()),
            "hash_lo": pa.array(out_rows["hash_lo"], pa.uint64()),
            "dom_ms": pa.array(out_rows["dom_ms"], pa.float64()),
            "ocr_ms": pa.array(out_rows["ocr_ms"], pa.float64()),
        })


def _aggregate_counters(counter_rows: List[dict]) -> List[dict]:
    """Combine per-batch counters into per-size_class manifest entries."""
    agg: dict = {}
    for r in counter_rows:
        sc = int(r["size_class"])
        a = agg.setdefault(sc, {"size_class": sc, "row_count": 0, "ocr_rows": 0,
                                "output_bytes": 0, "hash": 0,
                                "dom_ms": 0.0, "ocr_ms": 0.0,
                                "dom_ms_batches": [], "ocr_ms_batches": []})
        a["row_count"] += int(r["row_count"])
        a["ocr_rows"] += int(r["ocr_rows"])
        a["output_bytes"] += int(r["output_bytes"])
        a["hash"] ^= (int(r["hash_hi"]) << 64) | int(r["hash_lo"])
        a["dom_ms"] += float(r["dom_ms"])
        a["ocr_ms"] += float(r["ocr_ms"])
        a["dom_ms_batches"].append(float(r["dom_ms"]))
        a["ocr_ms_batches"].append(float(r["ocr_ms"]))
    out = []
    for sc in sorted(agg):
        a = agg[sc]
        a["content_hash"] = f"{a.pop('hash') & ((1 << 128) - 1):032x}"
        out.append(a)
    return out


def _write_wave_metrics(out_dir: str, wave: int, counters: List[dict]) -> None:
    """G1-analogue stage totals (crates/cli/src/bench.rs:139-172) per wave."""
    rows = {"partition_id": [], "stage": [], "count": [], "total_ms": [],
            "min_ms": [], "max_ms": []}
    for stage in ("dom", "ocr"):
        batches = [b for c in counters for b in c[f"{stage}_ms_batches"]]
        count = sum(c["ocr_rows"] if stage == "ocr" else c["row_count"]
                    for c in counters)
        rows["partition_id"].append(wave)
        rows["stage"].append(stage)
        rows["count"].append(count)
        rows["total_ms"].append(float(sum(batches)))
        rows["min_ms"].append(float(min(batches)) if batches else 0.0)
        rows["max_ms"].append(float(max(batches)) if batches else 0.0)
    mdir = os.path.join(out_dir, "_metrics")
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"wave-{wave:05d}.parquet")
    t = pa.table({
        "partition_id": pa.array(rows["partition_id"], pa.int32()),
        "stage": pa.array(rows["stage"], pa.string()),
        "count": pa.array(rows["count"], pa.int64()),
        "total_ms": pa.array(rows["total_ms"], pa.float64()),
        "min_ms": pa.array(rows["min_ms"], pa.float64()),
        "max_ms": pa.array(rows["max_ms"], pa.float64()),
    })
    pq.write_table(t, path + ".tmp")
    os.replace(path + ".tmp", path)


# Dataset CONSTRUCTION is serialized across overlapped waves: read_parquet's
# path resolution lazily imports fsspec.implementations.http, which raises
# ModuleNotFoundError here (no aiohttp) — harmless single-threaded (Ray
# catches it), but two threads importing at once can surface the torn module
# as a bare ImportError that Ray's `except ModuleNotFoundError` misses.
# Construction is microseconds next to execution, so the lock costs nothing.
_BUILD_LOCK = threading.Lock()


def _run_one_wave(out_dir: str, wave: int, wave_files: Sequence[str],
                  cfg: ExtractConfig, size_cuts: Sequence[int]) -> List[dict]:
    """One wave = one Dataset execution, committed atomically on success."""
    tmp = mf.wave_tmp_dir(out_dir, wave)
    os.makedirs(tmp, exist_ok=True)
    with _BUILD_LOCK:
        ds = build_extract_dataset(wave_files, cfg, size_cuts)
        # batch_size=2048 coalesces map-stage blocks so each size-class shard
        # file lands ~500+ rows (no tiny-file explosion) while keeping the
        # sink wide enough that the zstd-encode tail doesn't serialize the
        # end of each wave (4096 left only 5 sink tasks for a 20k wave)
        counters_ds = ds.map_batches(ShardSink(tmp), batch_format="pyarrow",
                                     batch_size=2048)
    counter_rows = counters_ds.take_all()   # tiny: one row per batch/class
    counters = _aggregate_counters(counter_rows)
    mf.commit_wave(out_dir, wave, [os.path.basename(f) for f in wave_files],
                   counters)
    _write_wave_metrics(out_dir, wave, counters)
    return counters


def run_extract_job(input_paths: Sequence[str], out_dir: str,
                    cfg: ExtractConfig = ExtractConfig(),
                    wave_size: int = 64,
                    max_waves: Optional[int] = None,
                    overlap: Optional[int] = None) -> dict:
    """Resumable extraction job: waves of input files, atomic per-wave commit.

    ``overlap`` (default ``$GRAFT_WAVE_OVERLAP`` or 1) is the number of
    wave executions in flight at once. Waves are independent Dataset
    executions with independent atomic commits, so overlap=2 lets wave
    N+1's read/map fill the slots drained by wave N's sink tail (the
    zstd-encode stragglers that otherwise serialize the end of every
    wave) — the waved-production analogue of what a single-wave job gets
    for free from streaming execution. Resume semantics are unchanged:
    commits may land out of order; ``committed_waves`` is a set and a
    re-run simply skips whatever committed. Byte identity is per-wave and
    unaffected by the interleaving (test_wave_overlap in
    tests/test_extract_pipeline.py).

    ``waves_skipped`` counts every already-committed wave of the full
    input up front (independent of ``max_waves``); before round 4 it only
    counted skips seen before the ``max_waves`` cutoff, so partial runs
    over a partially-committed directory now report a larger (complete)
    skipped count for the same on-disk state.

    Overlap > 1 is tasks-mode only: two concurrent actor pools starve
    each other for CPU slots (each pool sizes itself assuming it owns the
    session), so under ``GRAFT_EXTRACT_MODE=fused/split`` overlap is
    degraded to 1 with a warning — mirroring build_extract_dataset's
    tiny-session degradation rather than deadlocking.

    Returns a summary dict {waves_run, waves_skipped, rows, ocr_rows}.
    """
    files = sorted(input_paths)
    os.makedirs(out_dir, exist_ok=True)
    mf.clean_orphan_tmp(out_dir)
    done = mf.committed_waves(out_dir)
    size_cuts = compute_size_cuts(files, cfg)
    if overlap is None:
        overlap = int(os.environ.get("GRAFT_WAVE_OVERLAP", "1"))
    mode = os.environ.get("GRAFT_EXTRACT_MODE", "tasks")
    if overlap > 1 and mode in ("fused", "split"):
        import warnings
        warnings.warn(
            f"GRAFT_WAVE_OVERLAP={overlap} with GRAFT_EXTRACT_MODE={mode}: "
            "overlapped waves are tasks-mode only (concurrent actor pools "
            "starve each other); degrading to overlap=1", stacklevel=2)
        overlap = 1

    waves = [(w, files[s:s + wave_size])
             for w, s in enumerate(range(0, len(files), wave_size))]
    summary = {"waves_run": 0, "waves_skipped": 0, "rows": 0, "ocr_rows": 0,
               "size_cuts": size_cuts}
    summary["waves_skipped"] = sum(1 for w, _ in waves if w in done)
    pending = [(w, fs) for w, fs in waves if w not in done]
    if max_waves is not None:
        pending = pending[:max_waves]

    def _account(counters: List[dict]) -> None:
        summary["waves_run"] += 1
        summary["rows"] += sum(c["row_count"] for c in counters)
        summary["ocr_rows"] += sum(c["ocr_rows"] for c in counters)

    if overlap <= 1:
        for wave, wave_files in pending:
            _account(_run_one_wave(out_dir, wave, wave_files, cfg, size_cuts))
    else:
        from concurrent.futures import ThreadPoolExecutor, as_completed
        ex = ThreadPoolExecutor(max_workers=overlap)
        try:
            futs = [ex.submit(_run_one_wave, out_dir, wave, wave_files,
                              cfg, size_cuts)
                    for wave, wave_files in pending]
            try:
                # surface the FIRST failure as soon as it happens —
                # queued-but-unstarted waves are cancelled; waves already
                # in flight finish committing (their output stays valid
                # for resume, which simply skips them on the re-run)
                for f in as_completed(futs):
                    _account(f.result())
            except BaseException:
                ex.shutdown(wait=True, cancel_futures=True)
                raise
        finally:
            ex.shutdown(wait=True)

    if summary["waves_run"]:
        _write_job_report(out_dir)
    return summary


def _write_job_report(out_dir: str) -> None:
    """Stage-totals JSON over all committed waves (K2 analogue,
    crates/cli/src/bench.rs:200-249)."""
    import pyarrow.parquet as pq

    from ..sources.pages import write_bench_report
    mdir = os.path.join(out_dir, "_metrics")
    if not os.path.isdir(mdir):
        return
    rows = []
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(mdir, name))
        for r in t.to_pylist():
            rows.append({"stage": r["stage"], "count": r["count"],
                         "total_ms": r["total_ms"]})
    if rows:
        write_bench_report(rows, os.path.join(mdir, "report.json"))


def read_stage_totals(out_dir: str):
    """G1-style rollup: per-wave metrics → groupby(stage) totals Dataset."""
    import glob as _glob

    import ray.data
    from ray.data.aggregate import Max, Min, Sum
    files = sorted(_glob.glob(os.path.join(out_dir, "_metrics", "*.parquet")))
    ds = ray.data.read_parquet(files)
    return (ds.groupby("stage")
              .aggregate(Sum("count", alias_name="count"),
                         Sum("total_ms", alias_name="total_ms"),
                         Min("min_ms", alias_name="min_ms"),
                         Max("max_ms", alias_name="max_ms")))


def run_extract_simple(input_paths: Sequence[str], out_dir: str,
                       cfg: ExtractConfig = ExtractConfig()) -> None:
    """One-shot non-resumable variant using the native ``write_parquet``
    sink partitioned by size class — the preferred sink when per-wave
    checkpointing isn't needed (small backfills, interactive runs). The
    waved ``run_extract_job`` remains the production path."""
    ds = build_extract_dataset(sorted(input_paths), cfg)
    ds = ds.drop_columns(["dom_ms", "ocr_ms"])
    ds.write_parquet(out_dir, partition_cols=["size_class"])


def output_files(out_dir: str) -> List[str]:
    out = []
    for root, dirs, names in os.walk(out_dir):
        # prune in place: never descend into manifest/metrics dirs or
        # uncommitted .tmp-wave-* trees (their sc=* subdirs would otherwise
        # pass a basename check and leak partial data into readers)
        dirs[:] = [d for d in dirs
                   if not (d.startswith("_") or d.startswith("."))]
        for n in names:
            if n.endswith(".parquet"):
                out.append(os.path.join(root, n))
    return sorted(out)


def read_output(out_dir: str):
    """Dataset over the committed extraction output."""
    import ray.data
    return ray.data.read_parquet(output_files(out_dir))
