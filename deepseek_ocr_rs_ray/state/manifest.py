"""Per-partition lineage manifests — the resumable-output discipline.

Write-then-commit, like the reference's DSQ writer (temp payload file +
atomic finalize, crates/dsq-writer/src/lib.rs:93-113): each wave of input
files is processed by one pipeline execution into ``<out>/.tmp-wave-K/``,
renamed to ``<out>/wave=K/`` on success, and only then is the wave's
manifest file written (atomically, tmp+rename). On restart, waves with a
committed manifest are skipped and orphaned tmp dirs are removed — partial
partitions are re-run from input, never appended.

Manifest schema (FIXTURES.md §4): one row per (wave, size_class):
    partition_id:int32, size_class:int32, input_files:list<string>,
    row_count:int64, ocr_rows:int64, output_bytes:int64,
    output_file:string, content_hash:string, status:string
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema([
    ("partition_id", pa.int32()),
    ("size_class", pa.int32()),
    ("input_files", pa.list_(pa.string())),
    ("row_count", pa.int64()),
    ("ocr_rows", pa.int64()),
    ("output_bytes", pa.int64()),
    ("output_file", pa.string()),
    ("content_hash", pa.string()),
    ("status", pa.string()),
])


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def wave_dir(out_dir: str, wave: int) -> str:
    return os.path.join(out_dir, f"wave={wave:05d}")


def wave_tmp_dir(out_dir: str, wave: int) -> str:
    return os.path.join(out_dir, f".tmp-wave-{wave:05d}")


def wave_manifest_path(out_dir: str, wave: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"wave-{wave:05d}.parquet")


def committed_waves(out_dir: str) -> set:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    waves = set()
    for name in os.listdir(mdir):
        if name.startswith("wave-") and name.endswith(".parquet"):
            try:
                t = pq.read_table(os.path.join(mdir, name), columns=["status"])
            except Exception:
                continue  # torn manifest writes are impossible (tmp+rename),
                # but stay defensive: unreadable manifest = uncommitted wave
            if t.num_rows > 0 and all(s == "committed"
                                      for s in t.column("status").to_pylist()):
                waves.add(int(name[5:-8]))
    return waves


def clean_orphan_tmp(out_dir: str) -> List[str]:
    """Remove leftover .tmp-wave-* dirs AND published-but-uncommitted
    wave=K dirs from a killed run.

    A kill between commit_wave's data-dir rename and its manifest write
    leaves wave=K on disk with no committed manifest; its rows would leak
    through output_files() and the re-run's os.replace would hit ENOTEMPTY
    (ADVICE r01). Both orphan kinds are deleted here, so resume re-runs the
    wave from input cleanly.
    """
    removed = []
    if not os.path.isdir(out_dir):
        return removed
    done = committed_waves(out_dir)
    for name in os.listdir(out_dir):
        orphan_tmp = name.startswith(".tmp-wave-")
        orphan_wave = (name.startswith("wave=")
                       and name[5:].isdigit() and int(name[5:]) not in done)
        if orphan_tmp or orphan_wave:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            removed.append(name)
    return removed


def commit_wave(out_dir: str, wave: int, input_files: List[str],
                counters: List[dict]) -> None:
    """Atomically publish a finished wave: rename data dir, then manifest."""
    tmp = wave_tmp_dir(out_dir, wave)
    final = wave_dir(out_dir, wave)
    if os.path.isdir(final):
        # stale publish from a run killed before its manifest write —
        # this wave was never committed, so replace its data wholesale
        shutil.rmtree(final)
    os.replace(tmp, final)

    rows = {
        "partition_id": [wave] * len(counters),
        "size_class": [c["size_class"] for c in counters],
        "input_files": [input_files] * len(counters),
        "row_count": [c["row_count"] for c in counters],
        "ocr_rows": [c["ocr_rows"] for c in counters],
        "output_bytes": [c["output_bytes"] for c in counters],
        "output_file": [final] * len(counters),
        "content_hash": [c["content_hash"] for c in counters],
        "status": ["committed"] * len(counters),
    }
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    mpath = wave_manifest_path(out_dir, wave)
    pq.write_table(pa.Table.from_pydict(rows, schema=MANIFEST_SCHEMA),
                   mpath + ".tmp")
    os.replace(mpath + ".tmp", mpath)


def read_manifest(out_dir: str) -> Optional[pa.Table]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return None
    parts = [pq.read_table(os.path.join(mdir, n))
             for n in sorted(os.listdir(mdir)) if n.endswith(".parquet")]
    return pa.concat_tables(parts) if parts else None
