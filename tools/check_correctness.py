"""Local replica of the driver's correctness gate: run every queries() entry
at a given sf_dir, run its oracle_sql() via DuckDB over the same parquet
views, and compare row-count + column names + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns+rows ONLY — no dtype coercion. The driver hashes raw
    values, so an int64 Ray column vs a float64 oracle column must FAIL here
    even when every value compares equal (VERDICT r01: 11 such queries)."""
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype {c}: ray={a[c].dtype} sql={b[c].dtype}")
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            eq = (av.isna() & bv.isna()) | (av == bv)
        else:
            eq = (av.isna() & bv.isna()) | (av == bv)
        bad = int((~eq).sum())
        if bad:
            i = int(np.argmax(~eq.to_numpy()))
            problems.append(f"col {c}: {bad} mismatches, first at {i}: "
                            f"ray={av.iloc[i]!r} sql={bv.iloc[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    # sf-keyed oracle view (aux side-table paths for THIS sf); each query
    # rewrites its own aux before returning, and the tool always runs the
    # query before its oracle, so no prebuild pass is needed here
    oracles = entrymod.oracle_sql_for(sf_dir)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception:
            print(f"FAIL {name}: ray side raised")
            traceback.print_exc()
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows ({dt:.1f}s)")
            continue
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            failures += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(ray_df)} rows match ({dt:.1f}s)")
    ray.shutdown()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
