"""Distributed sketch operators: HyperLogLog approximate distinct count
and a Count-Min frequency sketch (q_cms_tokens, end of module).

The reference has no approximate aggregates (SURVEY.md §2.5) — at
10^12-document scale an exact COUNT(DISTINCT) over a high-cardinality key
is the textbook all-to-all shuffle this engine is supposed to avoid, so
the catalogue carries the standard sketch: HyperLogLog (Flajolet et al.
2007). The register array is a *combiner*: per-batch partial registers
merge by MAX, so the shuffle carries at most ``m`` rows per batch
regardless of input size — the same partial-agg discipline as every
G1-family aggregate here.

Deterministic cross-engine spec (hash-exact under the dtype-strict gate):

- 64-bit hash = first 16 hex chars of ``md5(str(key))`` (the repo's
  standard md5-bit trick, same as SimHash's oracle);
- ``m = 256`` registers (b = 8): bucket = top 8 bits, suffix = low 56
  bits, rank = 57 − bit_length(suffix) (= 57 when the suffix is 0);
- the harmonic sum is computed as the EXACT integer
  ``S = Σ 2^(57 − register)`` (empty register → 2^57) — Python big ints
  on one side, DuckDB HUGEINT on the other — so the only float steps are
  the final alpha·m²·2^57 / double(S) division chain, written with the
  identical literal/associativity structure in both engines, then
  round6-truncated;
- the small-range linear-counting correction is intentionally omitted:
  the point is the deterministic distributed-sketch shape, and the raw
  estimator keeps the cross-engine contract exact (documented bias at
  n ≪ m is part of the spec; the exact count ships alongside).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import read_table, single_row

HLL_M = 256          # registers (b = 8)
HLL_SUFFIX_BITS = 56


def hll_rank(suffix: int) -> int:
    """57 − bit_length(suffix); 57 for a zero suffix (all 56 bits zero)."""
    return 57 - suffix.bit_length() if suffix else 57


def hll_registers(keys) -> np.ndarray:
    """Register array (int64[m]) for an iterable of already-unique keys."""
    regs = np.zeros(HLL_M, dtype=np.int64)
    mask = (1 << HLL_SUFFIX_BITS) - 1
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:16], 16)
        b = h >> HLL_SUFFIX_BITS
        r = hll_rank(h & mask)
        if r > regs[b]:
            regs[b] = r
    return regs


def hll_estimate_from_registers(regs: np.ndarray) -> float:
    """Raw HLL estimate via the exact-integer harmonic sum (see module
    docstring); the float expression mirrors the SQL token-for-token."""
    s = sum(1 << (57 - int(r)) for r in regs)  # exact Python int
    return np.floor(
        0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
        * 144115188075855872.0 / float(s) * 1e6 + 0.5) / 1e6


def q_hll_users(sf_dir: str):
    """Approximate distinct ``user_id`` count over events via a 256-register
    HyperLogLog, with the exact count alongside for calibration.

    Scale shape: ONE pass — per-batch unique (user_id, shard) rows,
    64 bounded shard groups, each emitting its registers + exact-count
    sentinel (HLL registers MAX-merge across shards by construction). At
    10^12 keys the exact side is dropped and the sketch degenerates to the
    pure combiner (per-batch ``hll_registers`` → ≤256-row MAX-merge
    groupby — no shard group ever holds the key set); the exact side
    exists here because the fixture is small enough to afford the oracle.
    """
    ds = read_table(sf_dir, "events", ["user_id"])

    # ONE pass over events: per-batch unique (user_id, shard) rows co-group
    # under 64 bounded shards; each shard emits its HLL registers (register
    # assignment hashes user_id, so the elementwise MAX across shards is
    # the global register file) plus its exact distinct count as a
    # sentinel row (register = -1). The old two-pass shape (sketch groupby
    # + separate sharded-unique pass) paid a second full read + shuffle
    # for no extra information.
    N_SHARDS = 64

    def uniq(t: pa.Table) -> pa.Table:
        u = np.unique(t["user_id"].to_numpy(zero_copy_only=False))
        return pa.table({"user_id": pa.array(u),
                         "shard": pa.array(u & (N_SHARDS - 1))})

    def shard_stats(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["user_id"].to_numpy())
        regs = hll_registers(u)
        nz = np.nonzero(regs)[0]
        return pd.DataFrame({
            "register": np.concatenate([nz, [-1]]).astype(np.int64),
            "rank": np.concatenate([regs[nz], [len(u)]]).astype(np.int64)})

    parts = (ds.map_batches(uniq, batch_format="pyarrow")
               .groupby("shard")
               .map_groups(shard_stats, batch_format="pandas").to_pandas())
    regs = np.zeros(HLL_M, dtype=np.int64)
    reg_rows = parts[parts["register"] >= 0]
    np.maximum.at(regs, reg_rows["register"].to_numpy(),
                  reg_rows["rank"].to_numpy())
    n_exact = int(parts.loc[parts["register"] == -1, "rank"].sum())

    return single_row({
        "m": np.int64(HLL_M),
        "nonzero_registers": np.int64(int((regs > 0).sum())),
        "register_checksum": np.int64(int((np.arange(HLL_M) * regs).sum())),
        "hll_estimate": float(hll_estimate_from_registers(regs)),
        "n_exact": np.int64(n_exact),
    })


Q_HLL_USERS_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
h AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS hv
  FROM u
),
br AS (
  SELECT CAST(hv >> 56 AS BIGINT) AS register,
         CASE WHEN (hv & ((CAST(1 AS UBIGINT) << 56) - 1)) = 0 THEN 57
              ELSE 57 - CAST(length(bin(hv & ((CAST(1 AS UBIGINT) << 56) - 1)))
                             AS BIGINT)
         END AS rank
  FROM h
),
regs AS (
  SELECT g.register, CAST(COALESCE(MAX(br.rank), 0) AS BIGINT) AS rank
  FROM (SELECT unnest(generate_series(0, 255)) AS register) g
  LEFT JOIN br ON br.register = g.register
  GROUP BY g.register
),
s AS (
  SELECT SUM(CAST(1 AS HUGEINT) << (57 - rank)) AS s,
         CAST(SUM(CASE WHEN rank > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nz,
         CAST(SUM(register * rank) AS BIGINT) AS checksum
  FROM regs
)
SELECT CAST(256 AS BIGINT) AS m,
       s.nz AS nonzero_registers,
       s.checksum AS register_checksum,
       FLOOR(0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0) * 65536.0e0
             * 144115188075855872.0e0 / CAST(s.s AS DOUBLE) * 1e6 + 0.5)
         / 1e6 AS hll_estimate,
       (SELECT COUNT(DISTINCT user_id) FROM events) AS n_exact
FROM s
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (approximate frequencies with one-sided error)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_cols(token: str) -> list:
    """Counter column per hash row: md5("j:token") low 8 bits (same
    md5-bit trick as HLL/SimHash, mirrored verbatim in the oracle)."""
    return [int(hashlib.md5(f"{j}:{token}".encode()).hexdigest()[:16], 16)
            & (CMS_WIDTH - 1) for j in range(CMS_DEPTH)]


def q_cms_tokens(sf_dir: str):
    """Count-Min sketch of token frequencies over documents, reported next
    to the exact counts so the one-sided error (estimate >= exact, equality
    unless hashes collide) is visible per token.

    Scale shape: the sketch is the second combiner demo (after HLL) — a
    per-batch DEPTH×WIDTH integer counter matrix whose merge is SUM, so
    the shuffle is <= 1024 (row, col) cells per batch at any corpus size.
    The exact counts ride the SAME one-pass shuffle under token keys
    (vocabulary-bounded; an open vocab shards tokens by hash —
    q_top_tokens pattern); the per-token estimate (min over rows of the
    addressed cells) is a driver-side probe of two bounded tables. All
    counters are exact int64 on both engines — no float anywhere — so the
    gate compares hash-exactly.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..functions import textops as T

    ds = read_table(sf_dir, "documents", ["text"])

    # ONE pass: per-batch Counter feeds BOTH the sketch cells and the
    # exact token counts through a single SUM-merge groupby; cell rows ride
    # under sentinel keys ("\x00{j}:{col}" — a NUL byte cannot start a
    # token). Key cardinality stays bounded: ≤ DEPTH×WIDTH cells + vocab.
    # (The old shape paid a second full read + shuffle for the exact side.)
    def cms_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            c.update(T.ascii_tokens(s))
        keys, ns = [], []
        for tok, n in c.items():
            if tok.startswith("\x00"):
                # reserved for the sentinel cell keys. DuckDB VARCHAR
                # cannot carry NUL bytes, so an oracle-comparable corpus
                # never contains such tokens — skipping is pure
                # robustness against a crafted binary-ish input.
                continue
            keys.append(tok)
            ns.append(n)
            for j, col in enumerate(cms_cols(tok)):
                keys.append(f"\x00{j}:{col}")
                ns.append(n)
        return pa.table({"k": pa.array(keys, pa.string()),
                         "n": pa.array(np.array(ns, dtype=np.int64))})

    agg = (ds.map_batches(cms_partial, batch_format="pyarrow")
             .groupby("k")
             .aggregate(Sum("n", alias_name="n"))).to_pandas()
    is_cell = agg["k"].str.startswith("\x00")
    cells = agg[is_cell]
    cmat = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    if len(cells):
        jc = cells["k"].str[1:].str.split(":", expand=True).astype(np.int64)
        cmat[jc[0].to_numpy(), jc[1].to_numpy()] = cells["n"].to_numpy()
    exact = (agg[~is_cell].rename(columns={"k": "token",
                                           "n": "exact_count"})
             .reset_index(drop=True))

    est = np.array([min(cmat[j, col] for j, col in enumerate(cms_cols(tok)))
                    for tok in exact["token"]], dtype=np.int64)
    return pd.DataFrame({
        "token": exact["token"].to_numpy(),
        "exact_count": exact["exact_count"].astype("int64").to_numpy(),
        "cms_estimate": est,
        "overestimate": est - exact["exact_count"].astype("int64").to_numpy(),
    })


# plain ascii_tokens mirror, composed from the ONE canonical spelling of
# the ASCII-whitespace set (common.sql_tok_array; corpus.py keeps the
# lowercased variant)
from .common import sql_tok_array as _sql_tok_array  # noqa: E402

_SQL_TOKS = _sql_tok_array("text")

Q_CMS_TOKENS_SQL = rf"""
WITH toks AS (SELECT unnest({_SQL_TOKS}) AS t FROM documents),
tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY t),
h AS (
  SELECT tc.t, tc.c, js.j,
         CAST(('0x' || substr(md5(CAST(js.j AS VARCHAR) || ':' || tc.t), 1, 16))::UBIGINT
              & {CMS_WIDTH - 1} AS BIGINT) AS col
  FROM tc, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS j) js
),
cnt AS (SELECT j, col, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY j, col),
est AS (
  SELECT h.t, MIN(cnt.n) AS cms FROM h
  JOIN cnt ON h.j = cnt.j AND h.col = cnt.col
  GROUP BY h.t
)
SELECT tc.t AS token, tc.c AS exact_count,
       CAST(est.cms AS BIGINT) AS cms_estimate,
       CAST(est.cms - tc.c AS BIGINT) AS overestimate
FROM tc JOIN est ON tc.t = est.t
"""


# ---------------------------------------------------------------------------
# Bloom-filter-accelerated semi-join (exact result, sketch-pruned shuffle)
# ---------------------------------------------------------------------------

BLOOM_M = 32768
BLOOM_K = 3
BLOOM_SEGMENT = "MACHINERY"


def bloom_positions(key) -> list:
    """K bit positions for a key: md5("j:key") low 15 bits — the md5-bit
    trick again, mirrored verbatim in the oracle."""
    return [int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:16], 16)
            & (BLOOM_M - 1) for j in range(BLOOM_K)]


def q_bloom_semi_join(sf_dir: str):
    """Semi-join orders ⋉ (customers in one segment) with a Bloom-filter
    prefilter: the dimension side's keys are folded into a BLOOM_M-bit set
    (a distributed OR-combiner — per-batch bit positions, bounded-key
    dedup), the bit set is broadcast, facts are pruned per batch, and only
    survivors hit the exact membership verify. The result is EXACT (Bloom
    has no false negatives; the verify removes false positives) — the
    sketch only shrinks what moves. False positives are reported so the
    pruning quality is visible.

    Scale shape: pass 1 shuffles at most BLOOM_M distinct bit positions;
    pass 2 is a pure map + broadcast probe. The exact verify here uses the
    (dimension-bounded) broadcast key set — at a cardinality where that
    broadcast won't fit, the verify becomes the partitioned Dataset.join
    on the Bloom-reduced fact side (the q3/q5 broadcast→join cutover
    discipline), which is exactly what the prefilter exists to shrink.
    """
    import ray

    from .common import cents_arr, read_dim

    cust = read_dim(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = np.sort(cust.filter(
        pa.compute.equal(cust["c_mktsegment"], BLOOM_SEGMENT)
    )["c_custkey"].to_numpy())

    bits = np.zeros(BLOOM_M, dtype=bool)
    for k in keys:
        bits[bloom_positions(int(k))] = True
    state = ray.put((bits, keys))

    def probe(t: pa.Table) -> pa.Table:
        bset, kset = ray.get(state)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = cents_arr(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        uniq = np.unique(ck)
        # dtype=bool: an empty comprehension would otherwise yield float64
        # and uniq[upass] raises on a zero-row block
        upass = np.array([all(bset[p] for p in bloom_positions(int(u)))
                          for u in uniq], dtype=bool)
        pass_keys = uniq[upass]
        pre = np.isin(ck, pass_keys)
        true_m = np.isin(ck, kset)          # exact verify (broadcast side)
        return pa.table({
            "prefilter_pass": pa.array([np.int64(pre.sum())]),
            "n_orders": pa.array([np.int64(true_m.sum())]),
            "revenue_cents": pa.array([np.int64(cents[true_m].sum())]),
        })

    ds = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    parts = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    pre = int(parts["prefilter_pass"].sum())
    n = int(parts["n_orders"].sum())
    return single_row({
        "bloom_m": np.int64(BLOOM_M),
        "bloom_k": np.int64(BLOOM_K),
        "bits_set": np.int64(int(bits.sum())),
        "prefilter_pass": np.int64(pre),
        "n_orders": np.int64(n),
        "false_positives": np.int64(pre - n),
        "revenue_cents": np.int64(int(parts["revenue_cents"].sum())),
    })


Q_BLOOM_SEMI_SQL = f"""
WITH keys AS (
  SELECT DISTINCT c_custkey FROM customer
  WHERE c_mktsegment = '{BLOOM_SEGMENT}'
),
js AS (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j),
bits AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
                                  CAST(c_custkey AS VARCHAR)), 1, 16))::UBIGINT
              & {BLOOM_M - 1} AS BIGINT) AS b
  FROM keys, js
),
opos AS (
  SELECT o_orderkey, o_custkey,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
                                  CAST(o_custkey AS VARCHAR)), 1, 16))::UBIGINT
              & {BLOOM_M - 1} AS BIGINT) AS b
  FROM orders, js
),
op AS (
  SELECT o_orderkey, o_custkey, MAX(cents) AS cents,
         SUM(CASE WHEN b IN (SELECT b FROM bits) THEN 1 ELSE 0 END) AS hits
  FROM opos GROUP BY o_orderkey, o_custkey
),
pass AS (SELECT * FROM op WHERE hits = {BLOOM_K}),
truem AS (SELECT p.* FROM pass p JOIN keys k ON p.o_custkey = k.c_custkey)
SELECT CAST({BLOOM_M} AS BIGINT) AS bloom_m,
       CAST({BLOOM_K} AS BIGINT) AS bloom_k,
       (SELECT COUNT(*) FROM bits) AS bits_set,
       (SELECT COUNT(*) FROM pass) AS prefilter_pass,
       (SELECT COUNT(*) FROM truem) AS n_orders,
       (SELECT COUNT(*) FROM pass) - (SELECT COUNT(*) FROM truem)
         AS false_positives,
       (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM truem)
         AS revenue_cents
"""
