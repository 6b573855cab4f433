"""Shared helpers for the query catalogue.

Cross-engine float determinism: the DuckDB oracle and the Ray pipeline must
produce *identical* values, not just close ones. Rules used throughout:

- money/value sums are computed in integer cents via
  ``floor(x*100 + 0.5)`` — both engines evaluate the same IEEE-double
  expression, so the int64 results are identical and order-independent;
- averages/ratios are derived as ``double(int)/double(int)`` from those
  exact integers — a single deterministic division;
- similarity scores are truncated to 6 decimals via ``floor(x*1e6+0.5)/1e6``
  (DuckDB ``ROUND`` rounds half away from zero while NumPy rounds half to
  even, so neither engine's native round is used).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def read_table(sf_dir: str, name: str, columns: Optional[Sequence[str]] = None):
    """ray.data.read_parquet with column pruning (prune at the read)."""
    import ray.data
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=list(columns) if columns else None)


def read_dim(sf_dir: str, name: str,
             columns: Optional[Sequence[str]] = None) -> pa.Table:
    """Driver-side read of a DIMENSION table (region/nation/customer/...).

    Dimensions are broadcast-sized by definition; a full Ray pass to fetch
    them costs more in scheduling than the read itself. Fact tables always
    go through ``read_table``.
    """
    import pyarrow.parquet as pq
    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"),
                         columns=list(columns) if columns else None)


def cents_arr(x: pa.ChunkedArray | pa.Array) -> pa.Array:
    """floor(x*100 + 0.5) as int64 — exact-integer money representation."""
    return pc.cast(pc.floor(pc.add(pc.multiply(x, pa.scalar(100.0)),
                                   pa.scalar(0.5))), pa.int64())


def cents_np(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def round6_np(x: np.ndarray) -> np.ndarray:
    """floor(x*1e6+0.5)/1e6 — the cross-engine similarity truncation."""
    return np.floor(x * 1e6 + 0.5) / 1e6


SQL_CENTS = "CAST(FLOOR({expr}*100 + 0.5) AS BIGINT)"
SQL_ROUND6 = "FLOOR({expr}*1000000 + 0.5)/1000000"

# ASCII-whitespace tokenization mirrors (textops.ascii_tokens): DuckDB trim
# over the explicit ASCII set + an RE2 class with the same six characters
SQL_ASCII_TRIM = ("trim({col}, ' ' || chr(9) || chr(10) || chr(13) || "
                  "chr(12) || chr(11))")
SQL_ASCII_WS_PATTERN = r"[ \t\n\f\r\v]+"


def sql_tok_array(col: str) -> str:
    """``textops.ascii_tokens`` mirror as a SQL expression — the ONE
    canonical spelling of the ASCII-whitespace token array (empty/all-ws
    input → empty list, matching the Python kernel)."""
    trim = SQL_ASCII_TRIM.format(col=col)
    return (f"CASE WHEN {trim} = '' THEN CAST([] AS VARCHAR[]) "
            f"ELSE regexp_split_to_array({trim}, "
            f"'{SQL_ASCII_WS_PATTERN}') END")


def single_row(d: dict) -> pa.Table:
    return pa.table({k: [v] for k, v in d.items()})
