"""Strict-gate helpers: exact comparison with earliest-divergence reporting.

Semantics of the reference's cross-implementation gate
(benchsuite/orchestrator.py:456-521, earliest-divergence localization
475-478 and matrix rollup 1596-1665): equality is exact; on mismatch the
report carries the earliest diverging index and a context excerpt, so a
failure points at the first wrong byte instead of a wall of diff.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


def earliest_divergence(a: Sequence, b: Sequence) -> Optional[int]:
    """Index of the first position where the sequences differ (length
    difference counts as divergence at min(len)); None when identical."""
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    if len(a) != len(b):
        return n
    return None


def diff_report(name: str, got: str, want: str, context: int = 24) -> Optional[str]:
    """None when byte-identical; else a one-line report with the earliest
    diverging char index and excerpts around it."""
    idx = earliest_divergence(got, want)
    if idx is None:
        return None
    lo = max(idx - context, 0)
    return (f"{name}: diverges at char {idx}: "
            f"got ...{got[lo:idx + context]!r} want ...{want[lo:idx + context]!r}")


def strict_compare_rows(keys: Sequence[str], got_texts: Sequence[str],
                        want_texts: Sequence[str]) -> Tuple[int, List[str]]:
    """Per-key exact compare. Returns (n_mismatches, reports) where each
    report localizes the earliest divergence for its key (G8 rollup)."""
    assert len(keys) == len(got_texts) == len(want_texts)
    reports: List[str] = []
    for k, g, w in zip(keys, got_texts, want_texts):
        r = diff_report(k, g, w)
        if r is not None:
            reports.append(r)
    return len(reports), reports
