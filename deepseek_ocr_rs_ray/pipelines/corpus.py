"""Training-data corpus operators over ``documents`` / ``embeddings`` and the
synthetic ``pages`` fixture: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine), similarity search (brute-force cosine
top-k + LSH-bucketed ANN), text analysis (language id, quality scores, token
counts, fingerprints), and multimodal metadata probing.

Scale patterns:

- exact dedup: content-hash column in ``map_batches`` → hash-partitioned
  ``groupby`` → first/min per group (the only shuffle touches hashes+ids);
- MinHash-LSH: signatures per batch → explode to (band, bucket, doc) rows →
  ``groupby`` band buckets → candidate pairs → verified Jaccard (broadcast
  shingle sets at test scale; at corpus scale the verify step is a second
  bucketed join — noted inline);
- brute-force ANN: query matrix broadcast once via ``ray.put``, per-batch
  float64 matmul, local top-k then tiny global reduce;
- LSH ANN: seeded random-hyperplane signatures bucket both corpus and query;
  exact rescoring only within matching buckets.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textops as T
from .common import read_table, round6_np, sql_tok_array as _sql_tok_array

# ---------------------------------------------------------------------------
# text analysis (SQL-oracled)
# ---------------------------------------------------------------------------


def q_token_stats(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        # fully vectorized: RE2 run-count kernels with fuzz-pinned parity
        # to the scalar textops kernels (test_cross_engine_fuzz)
        text = t.column("text")
        return pa.table({
            "doc_id": t["doc_id"],
            "ws_tokens": pc.cast(T.ws_token_counts_arrow(text), pa.int64()),
            "bpe_tokens": pc.cast(T.bpe_ish_token_counts_arrow(text), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


Q_TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '[ \t\n\f\r\v]+')) END AS ws_tokens,
       len(regexp_extract_all(text, '{T.BPE_ISH_PATTERN}')) AS bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def q_quality_by_lang(sf_dir: str):
    from ray.data.aggregate import Sum
    ds = read_table(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        text = t.column("text")
        tmp = pa.table({
            "lang": t["lang"],
            "chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "tokens": pc.cast(T.ws_token_counts_arrow(text), pa.int64()),
            "digits": pc.cast(T.digit_counts_arrow(text), pa.int64()),
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        return tmp.group_by("lang").aggregate(
            [("chars", "sum"), ("tokens", "sum"), ("digits", "sum"), ("n", "sum")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("lang")
             .aggregate(Sum("chars_sum", alias_name="sum_chars"),
                        Sum("tokens_sum", alias_name="sum_tokens"),
                        Sum("digits_sum", alias_name="sum_digits"),
                        Sum("n_sum", alias_name="n_docs")))
    df = agg.to_pandas()
    df["avg_chars"] = df["sum_chars"].astype(np.float64) / df["n_docs"].astype(np.float64)
    return df


Q_QUALITY_SQL = r"""
SELECT lang,
       CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_chars,
       CAST(SUM(CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '[ \t\n\f\r\v]+')) END) AS BIGINT) AS sum_tokens,
       CAST(SUM(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)) AS BIGINT) AS sum_digits,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(length(text) AS BIGINT)) AS DOUBLE)/COUNT(*) AS avg_chars
FROM documents GROUP BY lang
"""


def q_doc_fingerprint(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table({"doc_id": t["doc_id"],
                         "text_md5": pa.array([T.md5_hex(s) for s in texts])})

    return ds.map_batches(f, batch_format="pyarrow")


Q_FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS text_md5 FROM documents"


def q_quality_filter(sf_dir: str):
    """Quality gate as a standalone filter: docs with >= 20 tokens and digit
    ratio < 0.3 (all predicates over exact integer counts, so the SQL oracle
    matches bit-for-bit)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        keep = []
        for i, s in zip(ids, texts):
            toks = T.ws_token_count(s)
            digits = len(T._DIGIT_RE.findall(s))
            n = len(s)
            if toks >= 20 and (n == 0 or digits / n < 0.3):
                keep.append(i)
        return pa.table({"doc_id": pa.array(keep, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


Q_QUALITY_FILTER_SQL = r"""
SELECT doc_id FROM documents
WHERE (CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '[ \t\n\f\r\v]+')) END) >= 20
  AND (length(text) = 0 OR
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) < 0.3)
"""


def q_langid(sf_dir: str):
    """Language-id heuristic; the SQL oracle mirrors the rule set exactly
    (CJK regex → zh, else argmax of stopword hit counts with fixed en>de>fr
    tie order, zero score → unk) over the same ASCII tokenization."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "lang_pred": pa.array([T.detect_lang(s) for s in texts])})

    return ds.map_batches(f, batch_format="pyarrow")


def _sql_str_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(words)) + "]"


# lowercased ASCII-ws tokens, as a reusable SQL fragment (same trim/split
# idiom as Q_TOKEN_STATS_SQL)
_SQL_LOWER_TOKS = (
    r"list_filter(list_transform(regexp_split_to_array("
    r"trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), "
    r"'[ \t\n\f\r\v]+'), x -> lower(x)), x -> x <> '')"
)

Q_LANGID_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang,
         {_SQL_LOWER_TOKS} AS toks,
         regexp_matches(text, '[一-鿿㐀-䶿]') AS has_cjk
  FROM documents
), s AS (
  SELECT doc_id, lang, has_cjk,
         len(list_filter(toks, x -> list_contains({_sql_str_list(T._STOPWORDS['en'])}, x))) AS s_en,
         len(list_filter(toks, x -> list_contains({_sql_str_list(T._STOPWORDS['de'])}, x))) AS s_de,
         len(list_filter(toks, x -> list_contains({_sql_str_list(T._STOPWORDS['fr'])}, x))) AS s_fr
  FROM t
)
SELECT doc_id, lang,
       CASE WHEN has_cjk THEN 'zh'
            WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'unk' END AS lang_pred
FROM s
"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

DEDUP_SHARDS = 256


def q_dedup_exact(sf_dir: str):
    """Exact dedup (D4): hash → SHARDED groupby → vectorized in-group agg.

    The shuffle key is the md5's first byte (256 groups), never the hash
    itself: a Ray groupby over the full hash column is one group per
    distinct document (~33s/80k keys on this host, unbounded at corpus
    scale), while per-shard pandas groupby handles millions of hashes per
    group vectorized.
    """
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        md5s = [T.md5_hex(s) for s in texts]
        return pa.table({"doc_id": t["doc_id"],
                         "text_md5": pa.array(md5s),
                         "shard": pa.array([int(h[:2], 16) for h in md5s],
                                           pa.int64())})

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("text_md5")["doc_id"]
                .agg(keep_id="min", n_copies="size").reset_index())
        out["n_copies"] = out["n_copies"].astype("int64")
        return out[["text_md5", "keep_id", "n_copies"]]

    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("shard")
              .map_groups(dedup_group, batch_format="pandas"))


Q_DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_jaccard_vs_doc0(sf_dir: str):
    """Word-set Jaccard of every document against doc_id=0 (n-gram Jaccard
    with n=1; the SQL oracle uses DuckDB list ops on the same tokenization).

    Scale note: the query document is fetched once (streamed scan, stops at
    the first matching batch) and its token set broadcast via ray.put; the
    scoring pass is embarrassingly parallel with no shuffle.
    """
    import ray
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    q_text = None
    for b in docs.iter_batches(batch_format="pyarrow"):
        ids = b["doc_id"].to_pylist()
        if 0 in ids:
            q_text = b["text"].to_pylist()[ids.index(0)]
            break
    if q_text is None:
        raise KeyError(0)
    qset = frozenset(tok.lower() for tok in T.ascii_tokens(q_text))
    q_ref = ray.put(qset)

    def f(t: pa.Table) -> pa.Table:
        qs = ray.get(q_ref)
        texts = t.column("text").to_pylist()
        out = np.empty(len(texts), dtype=np.float64)
        for i, s in enumerate(texts):
            w = frozenset(tok.lower() for tok in T.ascii_tokens(s))
            inter = len(w & qs)
            union = len(w) + len(qs) - inter
            out[i] = inter / union if union else 0.0
        return pa.table({"doc_id": t["doc_id"],
                         "jaccard": pa.array(round6_np(out))})

    return docs.map_batches(f, batch_format="pyarrow")


Q_JACCARD_SQL = r"""
WITH q AS (
  SELECT list_distinct(regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))), '[ \t\n\f\r\v]+')) AS w
  FROM documents WHERE doc_id = 0
)
SELECT d.doc_id,
  FLOOR(
    CAST(len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(d.text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))), '[ \t\n\f\r\v]+')), q.w)) AS DOUBLE)
    / (len(list_distinct(regexp_split_to_array(lower(trim(d.text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))), '[ \t\n\f\r\v]+'))) + len(q.w)
       - len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(d.text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))), '[ \t\n\f\r\v]+')), q.w)))
    * 1000000 + 0.5) / 1000000 AS jaccard
FROM documents d, q
"""


PAIR_BUCKET_CAP = int(os.environ.get("GRAFT_PAIR_BUCKET_CAP", "2000"))
BUCKET_KEY_CAP = int(os.environ.get("GRAFT_BUCKET_KEY_CAP", "100000"))


def _oversized_buckets(ds, key_col: str, cap: int,
                       key_cap: int = None) -> dict:
    """{key: ceil(n/cap)} for every bucket with more than ``cap`` rows.

    The driver never funnels one row per distinct key: per-batch partial
    counts STREAM via iter_batches under a ``key_cap`` distinct-key budget
    (the q_decontaminate discipline). If the key space exceeds the budget,
    cut over to a distributed pass — fold keys into 256 crc shards (the
    CLAUDE.md bounded-groupby rule), sum per key inside each shard, and
    ship ONLY the oversized keys back (at most total_rows/cap of them, by
    pigeonhole). Both paths return the identical map."""
    import zlib as _zlib

    if key_cap is None:
        key_cap = BUCKET_KEY_CAP

    def partial_counts(t: pa.Table) -> pa.Table:
        return (t.select([key_col]).group_by(key_col)
                .aggregate([(key_col, "count")]))

    counts_ds = ds.map_batches(partial_counts, batch_format="pyarrow")
    acc: dict = {}
    capped = False
    for b in counts_ds.iter_batches(batch_format="pyarrow"):
        for k, n in zip(b[key_col].to_pylist(),
                        b[f"{key_col}_count"].to_pylist()):
            acc[k] = acc.get(k, 0) + int(n)
        if len(acc) > key_cap:
            capped = True
            break
    if not capped:
        return {k: int(np.ceil(n / cap)) for k, n in acc.items() if n > cap}

    def tag_shard(t: pa.Table) -> pa.Table:
        shards = np.array([_zlib.crc32(str(k).encode()) & 255
                           for k in t[key_col].to_pylist()], dtype=np.int64)
        return t.append_column("_shard", pa.array(shards))

    def big_only(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or key_col not in g.columns:   # schema-probe batch
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        s = g.groupby(key_col, sort=False)[f"{key_col}_count"].sum()
        s = s[s > cap]
        return pd.DataFrame({key_col: s.index,
                             "n": s.to_numpy(dtype=np.int64)})

    big = (counts_ds.map_batches(tag_shard, batch_format="pyarrow")
           .groupby("_shard").map_groups(big_only, batch_format="pandas")
           .to_pandas())
    if big.empty or key_col not in big.columns:  # no oversized buckets
        return {}
    return {k: int(np.ceil(n / cap))
            for k, n in zip(big[key_col], big["n"])}


def _capped_bucket_pairs(ds, key_col: str, id_col: str, pair_fn, cross_fn,
                         cap: int = None):
    """All-pairs within each ``key_col`` bucket with NO unbounded quadratic
    task: any bucket larger than ``cap`` rows is decomposed into triangle
    blocks — each row hashes to one of m = ceil(k/cap) blocks, rows are
    replicated into every block-pair group (p, q) they touch, and group
    (p, q) computes only within-block (p == q) or cross-block (p < q)
    pairs. The union of groups covers every unordered pair exactly once,
    per-task row count is bounded by ~2·cap, and the O(k²) total work
    parallelizes over m(m+1)/2 tasks instead of stalling one. Replication
    cost (m× the oversized bucket) only applies to oversized buckets; when
    none exist this is exactly the plain bucketed groupby.

    ``pair_fn(g)`` emits pairs among all rows of ``g``; ``cross_fn(a, b)``
    emits only pairs spanning the two frames.
    """
    if cap is None:
        cap = PAIR_BUCKET_CAP

    m_of = _oversized_buckets(ds, key_col, cap)
    if not m_of:
        return ds.groupby(key_col).map_groups(pair_fn,
                                              batch_format="pandas")

    gold = np.uint64(0x9E3779B97F4A7C15)

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = []
        for key, sub in df.groupby(key_col, sort=False):
            m = m_of.get(key, 1)
            if m == 1:
                sub = sub.copy()
                sub["_bp"] = 0
                sub["_bq"] = 0
                sub["_blk"] = 0
                out.append(sub)
                continue
            ids = sub[id_col].to_numpy().astype(np.uint64)
            blk = ((ids * gold) >> np.uint64(33)).astype(np.int64) % m
            for p in range(m):
                for q in range(p, m):
                    mask = (blk == p) | (blk == q)
                    if not mask.any():
                        continue
                    rep = sub[mask].copy()
                    rep["_bp"] = p
                    rep["_bq"] = q
                    rep["_blk"] = blk[mask]
                    out.append(rep)
        return pa.Table.from_pandas(pd.concat(out, ignore_index=True),
                                    preserve_index=False)

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        bp, bq = int(g["_bp"].iat[0]), int(g["_bq"].iat[0])
        if bp == bq:
            return pair_fn(g.drop(columns=["_bp", "_bq", "_blk"]))
        a = g[g["_blk"] == bp].drop(columns=["_bp", "_bq", "_blk"])
        b = g[g["_blk"] == bq].drop(columns=["_bp", "_bq", "_blk"])
        return cross_fn(a, b)

    return (ds.map_batches(expand, batch_format="pyarrow")
            .groupby([key_col, "_bp", "_bq"])
            .map_groups(block_pairs, batch_format="pandas"))


def _run_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated ``[s, s+len)`` integer ranges, vectorized (the standard
    cumsum-of-ones-with-jump-corrections idiom). Assumes every len >= 1."""
    if len(lens) == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    out = np.ones(int(ends[-1]), dtype=np.int64)
    out[0] = starts[0]
    out[ends[:-1]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(out)


def _jaccard_pair_frame(ids_a, sets_a, ids_b, sets_b, same: bool,
                        threshold: float) -> pd.DataFrame:
    """Pairs above threshold between two id/set lists (all i<j pairs when
    ``same``, else every cross pair once, ordered a < b).

    Vectorized: token→doc incidence lists are aligned per shared token and
    the full na×nb intersection-count matrix accumulates via one bincount
    over flattened (i, j) pair indices — total work equals the sum of
    per-token |A_t|·|B_t| cross products (the same work the old per-pair
    set-intersection loop did), but in numpy instead of cap² Python
    iterations. Threshold tests the RAW jaccard (then truncates for
    output) — identical keep/drop to the old loop."""
    na, nb = len(ids_a), len(ids_b)
    empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})
    if na == 0 or nb == 0:
        return empty
    sa = np.array([len(s) for s in sets_a], dtype=np.int64)
    sb = np.array([len(s) for s in sets_b], dtype=np.int64)
    toks_a = [t for s in sets_a for t in s]
    toks_b = [t for s in sets_b for t in s]
    docs_a = np.repeat(np.arange(na, dtype=np.int64), sa)
    docs_b = np.repeat(np.arange(nb, dtype=np.int64), sb)
    inter = np.zeros((na, nb), dtype=np.int64)
    if toks_a and toks_b:
        _, inv = np.unique(np.array(toks_a + toks_b, dtype=object),
                           return_inverse=True)
        ta, tb = inv[:len(toks_a)], inv[len(toks_a):]
        oa = np.argsort(ta, kind="stable")
        ob = np.argsort(tb, kind="stable")
        ta, docs_a = ta[oa], docs_a[oa]
        tb, docs_b = tb[ob], docs_b[ob]
        ua, ia, ca = np.unique(ta, return_index=True, return_counts=True)
        ub, ib, cb = np.unique(tb, return_index=True, return_counts=True)
        _, pa_i, pb_i = np.intersect1d(ua, ub, assume_unique=True,
                                       return_indices=True)
        if len(pa_i):
            la, off_a = ca[pa_i], ia[pa_i]
            lb, off_b = cb[pb_i], ib[pb_i]
            # i side: each a-doc of the token's run, repeated lb times
            i_idx = np.repeat(docs_a[_run_ranges(off_a, la)],
                              np.repeat(lb, la))
            # j side: per token, the b run tiled la times (a-major order)
            block_lens = la * lb
            total = int(block_lens.sum())
            starts = np.concatenate(
                [[0], np.cumsum(block_lens)[:-1]]).astype(np.int64)
            pos = (np.arange(total, dtype=np.int64)
                   - np.repeat(starts, block_lens))
            j_idx = docs_b[np.repeat(off_b, block_lens)
                           + pos % np.repeat(lb, block_lens)]
            inter = np.bincount(i_idx * nb + j_idx,
                                minlength=na * nb).reshape(na, nb)
    union = sa[:, None] + sb[None, :] - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    mask = jac >= threshold
    if same:
        mask &= np.triu(np.ones_like(mask), k=1)
    ii, jj = np.nonzero(mask)
    xa = np.asarray(ids_a, dtype=np.int64)[ii]
    xb = np.asarray(ids_b, dtype=np.int64)[jj]
    return pd.DataFrame({
        "a": pd.Series(np.minimum(xa, xb), dtype="int64"),
        "b": pd.Series(np.maximum(xa, xb), dtype="int64"),
        "jaccard": pd.Series(np.floor(jac[ii, jj] * 1e6 + 0.5) / 1e6,
                             dtype="float64")})


def q_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                    bucket_cap: int = None):
    """Near-dup pairs by word-set Jaccard within each ``source`` bucket.

    Bucketed-pairs shape with a SQL oracle: each bucket co-locates via the
    groupby, the O(k²) verify runs inside — and oversized buckets are
    triangle-block-decomposed (``_capped_bucket_pairs``) so a skewed bucket
    parallelizes instead of stalling one task. At corpus scale the
    bucketing key comes from LSH (q_minhash_pairs).
    """
    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def prep(g: pd.DataFrame):
        g = g.sort_values("doc_id")
        sets = [frozenset(tok.lower() for tok in T.ascii_tokens(t))
                for t in g["text"]]
        return g["doc_id"].to_numpy(), sets

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids, sets = prep(g)
        return _jaccard_pair_frame(ids, sets, ids, sets, True, threshold)

    def cross(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        ids_a, sets_a = prep(a)
        ids_b, sets_b = prep(b)
        return _jaccard_pair_frame(ids_a, sets_a, ids_b, sets_b, False,
                                   threshold)

    return _capped_bucket_pairs(docs, "source", "doc_id", pairs, cross,
                                cap=bucket_cap)


Q_JACCARD_PAIRS_SQL = r"""
WITH t AS (
  SELECT doc_id, source,
         list_distinct(regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))), '[ \t\n\f\r\v]+')) AS w
  FROM documents
)
SELECT a.doc_id AS a, b.doc_id AS b,
  FLOOR(
    CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
    / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)))
    * 1000000 + 0.5) / 1000000 AS jaccard
FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
      / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.5
"""


def q_train_val_split(sf_dir: str):
    """Deterministic dataset split (train/val/test ≈ 90/5/5) by md5 of the
    doc id — reproducible at any parallelism, no RNG state to ship; the
    standard hash-split for training corpora. Returns per-split counts and
    token totals."""
    from ray.data.aggregate import Sum
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        splits = []
        for i in ids:
            bucket = int(T.md5_hex(str(i))[:2], 16) % 20
            splits.append("train" if bucket < 18
                          else ("val" if bucket == 18 else "test"))
        tmp = pa.table({
            "split": pa.array(splits, pa.string()),
            "tokens": pa.array([T.ws_token_count(s) for s in texts],
                               pa.int64()),
            "n": pa.array(np.ones(len(ids), dtype=np.int64)),
        })
        return tmp.group_by("split").aggregate([("tokens", "sum"),
                                                ("n", "sum")])

    return (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("split")
              .aggregate(Sum("tokens_sum", alias_name="sum_tokens"),
                         Sum("n_sum", alias_name="n_docs")))


Q_TRAIN_VAL_SPLIT_SQL = rf"""
SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 20 < 18 THEN 'train'
            WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 20 = 18 THEN 'val'
            ELSE 'test' END AS split,
       CAST(SUM(CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '[ \t\n\f\r\v]+')) END) AS BIGINT) AS sum_tokens,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""

PACK_BIN_TOKENS = 2048
PACK_BUCKETS = 256


def q_pack_bins(sf_dir: str):
    """Sequence packing (training-batch assembly): documents in a globally
    deterministic order (md5(text), doc_id) are packed greedily into
    ~PACK_BIN_TOKENS-token bins; each doc gets its bin id.

    The distributed shape is a two-phase PREFIX SUM: the md5's first byte
    gives 256 ORDERED range buckets; phase 1 pre-aggregates per-bucket
    token totals (tiny), the driver prefix-sums them into bucket offsets
    and broadcasts; phase 2 co-groups each bucket, sorts locally, local
    cumsum + bucket offset = exact global running total → bin id. No
    global sort, no sequential pass."""
    import ray
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        md5s = [T.md5_hex(s) for s in texts]
        return pa.table({
            "bucket": pa.array([int(h[:2], 16) for h in md5s], pa.int64()),
            "text_md5": pa.array(md5s, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "tokens": pa.array([T.ws_token_count(s) for s in texts],
                               pa.int64()),
        })

    tagged = docs.map_batches(tag, batch_format="pyarrow")

    # phase 1: per-bucket token totals (pre-agg inside map_batches, then a
    # 256-group reduce) → driver prefix sum → broadcast offsets
    def bucket_partial(t: pa.Table) -> pa.Table:
        return t.select(["bucket", "tokens"]).group_by("bucket").aggregate(
            [("tokens", "sum")])

    from ray.data.aggregate import Sum
    totals = (tagged.map_batches(bucket_partial, batch_format="pyarrow")
              .groupby("bucket")
              .aggregate(Sum("tokens_sum", alias_name="total"))
              .to_pandas().sort_values("bucket"))
    offsets = np.zeros(PACK_BUCKETS, dtype=np.int64)
    cum = 0
    for b, tot in zip(totals["bucket"], totals["total"]):
        offsets[int(b)] = cum
        cum += int(tot)
    off_ref = ray.put(offsets)

    # phase 2: per-bucket local sort + cumsum + offset = global running sum
    def pack(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["text_md5", "doc_id"])
        before = g["tokens"].cumsum() - g["tokens"] + offs[int(g["bucket"].iloc[0])]
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "bin_id": (before // PACK_BIN_TOKENS).astype("int64"),
        })

    return tagged.groupby("bucket").map_groups(pack, batch_format="pandas")


Q_PACK_BINS_SQL = rf"""
SELECT doc_id,
       CAST((running - tokens) // {PACK_BIN_TOKENS} AS BIGINT) AS bin_id
FROM (
  SELECT doc_id, tokens,
         SUM(tokens) OVER (ORDER BY text_md5, doc_id
                           ROWS UNBOUNDED PRECEDING) AS running
  FROM (
    SELECT doc_id, md5(text) AS text_md5,
           CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '[ \t\n\f\r\v]+')) END AS tokens
    FROM documents)
)
"""

TOKEN_SHARDS = 64
TOP_TOKENS_K = 50


def q_top_tokens(sf_dir: str, k: int = TOP_TOKENS_K):
    """Corpus heavy hitters: top-k lowercased tokens by total occurrence
    count (ties → token ascending). The wordcount-at-scale shape: per-batch
    Counter pre-agg → token-hash-shard groupby (bounded group count, never
    one group per distinct token) → per-shard vectorized sum + local top-k
    → tiny driver reduce of <= k*shards rows."""
    from collections import Counter
    ds = read_table(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            c.update(x.lower() for x in T.ascii_tokens(s))
        toks = list(c.keys())
        shard = [T.crc32_str(x) & (TOKEN_SHARDS - 1) for x in toks]
        return pa.table({"shard": pa.array(shard, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "n": pa.array([c[x] for x in toks], pa.int64())})

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token")["n"].sum().reset_index(name="n_occurrences")
        return s.sort_values(["n_occurrences", "token"],
                             ascending=[False, True]).head(k)

    df = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("shard").map_groups(shard_topk, batch_format="pandas")
            .to_pandas())
    return (df.sort_values(["n_occurrences", "token"],
                           ascending=[False, True])
              .head(k).reset_index(drop=True))


Q_TOP_TOKENS_SQL = rf"""
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM (SELECT unnest({_SQL_LOWER_TOKS}) AS tok FROM documents)
GROUP BY tok
ORDER BY n_occurrences DESC, token ASC
LIMIT {TOP_TOKENS_K}
"""

STRATIFIED_K = 10


def q_sample_stratified(sf_dir: str, k: int = STRATIFIED_K):
    """Deterministic stratified sample: the k docs per ``lang`` ranked by
    (md5(text), doc_id) — reproducible independent of partitioning/retries
    (the seeded-sampling contract, per group). Per-batch local top-k per
    lang collapses the stream before the tiny per-group reduce."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])

    def local_topk(t: pa.Table) -> pa.Table:
        md5s = [T.md5_hex(s) for s in t.column("text").to_pylist()]
        g = pd.DataFrame({"lang": t["lang"].to_pylist(),
                          "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                          "text_md5": md5s})
        g = g.sort_values(["lang", "text_md5", "doc_id"])
        return pa.Table.from_pandas(g.groupby("lang").head(k),
                                    preserve_index=False)

    df = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["lang", "text_md5", "doc_id"])
    df["rank"] = df.groupby("lang").cumcount() + 1
    out = df[df["rank"] <= k].reset_index(drop=True)
    out["rank"] = out["rank"].astype("int64")
    return out[["lang", "rank", "doc_id", "text_md5"]]


Q_STRATIFIED_SQL = f"""
SELECT lang, rank, doc_id, text_md5 FROM (
  SELECT lang,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY md5(text), doc_id) AS BIGINT) AS rank,
         doc_id, md5(text) AS text_md5
  FROM documents
) WHERE rank <= {STRATIFIED_K}
"""


DUP_CLUSTER_PAIR_CAP = int(os.environ.get("GRAFT_DUP_CLUSTER_PAIR_CAP",
                                          "2000000"))


def q_dup_clusters(sf_dir: str, threshold: float = 0.4,
                   pair_cap: int = None):
    """Near-dup clusters: connected components over the embedding-cosine
    dup-pair graph, labeled by min vec_id; returns every non-singleton
    member with its canonical id.

    The pair set is usually the SMALL side (output of the bucketed pair
    mining), so the fast path collects it under ``pair_cap`` and runs
    driver union-find. A duplicate-heavy corpus — the exact case dedup
    exists for — can make the pair list O(corpus); above the cap this cuts
    over to distributed min-label propagation over the edge Dataset
    (``_dup_clusters_distributed``), the same fixpoint the SQL oracle's
    recursive CTE reaches. Both paths produce identical output."""
    if pair_cap is None:
        pair_cap = DUP_CLUSTER_PAIR_CAP
    res = q_embed_dup_pairs(sf_dir, threshold)
    if hasattr(res, "iter_batches"):        # Dataset: cap-guarded collect
        chunks: list = []
        n = 0
        over = False
        for bt in res.iter_batches(batch_format="pyarrow"):
            chunks.append(bt.select(["a", "b"]))
            n += bt.num_rows
            if n > pair_cap:
                over = True
                break
        if over:
            return _dup_clusters_distributed(
                res.select_columns(["a", "b"]))
        pairs = (pa.concat_tables(chunks).to_pandas() if chunks
                 else pd.DataFrame({"a": [], "b": []}))
    else:
        pairs = res

    labels = _union_find_labels(pairs)
    members = sorted(labels)
    return pd.DataFrame({
        "vec_id": pd.Series(members, dtype="int64"),
        "cluster_id": pd.Series([labels[m] for m in members],
                                dtype="int64"),
    })


def _union_find_labels(pairs) -> dict:
    """Min-id connected-component label per member of the pair graph
    (path-halving union-find; O(pairs · α)). ``pairs`` is any mapping with
    ``a``/``b`` integer columns."""
    parent: dict = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        parent.setdefault(ra, ra)
        parent.setdefault(rb, rb)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {m: find(m) for m in parent}


def _dup_clusters_distributed(pairs_ds, max_rounds: int = 64):
    """Scale path for connected components: min-label propagation over the
    edge Dataset until fixpoint. Per round: labels join the (bidirectional
    + self-loop) edges on src, a sharded min-aggregate per dst produces the
    next labels, and a join against the previous labels counts changes.
    Converges in O(component diameter) rounds — duplicate clusters are
    dense blobs, so a handful in practice; ``max_rounds`` is a safety rail.
    No driver-side collection at any point beyond the per-round changed
    count (a scalar)."""
    import ray
    n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    N_SHARDS = 64

    def to_edges(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b, a, b])
        dst = np.concatenate([b, a, a, b])   # both directions + self-loops
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = pairs_ds.map_batches(to_edges,
                                 batch_format="pyarrow").materialize()

    def vert_shard(v: np.ndarray) -> np.ndarray:
        return ((v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(40)).astype(np.int64) % N_SHARDS

    def init_labels(t: pa.Table) -> pa.Table:
        v = np.unique(t["src"].to_numpy(zero_copy_only=False))
        return pa.table({"shard": pa.array(vert_shard(v)),
                         "src": pa.array(v), "lbl": pa.array(v)})

    def dedup_min(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("src", sort=False)["lbl"].min().reset_index())
        out["src"] = out["src"].astype("int64")
        out["lbl"] = out["lbl"].astype("int64")
        return out[["src", "lbl"]]

    labels = (edges.map_batches(init_labels, batch_format="pyarrow")
              .groupby("shard").map_groups(dedup_min, batch_format="pandas")
              .materialize())

    for _ in range(max_rounds):
        joined = edges.join(labels, join_type="inner",
                            num_partitions=n_parts, on=("src",))

        def relabel(t: pa.Table) -> pa.Table:
            dst = t["dst"].to_numpy(zero_copy_only=False)
            return pa.table({"shard": pa.array(vert_shard(dst)),
                             "src": t["dst"], "lbl": t["lbl"]})

        new_labels = (joined.map_batches(relabel, batch_format="pyarrow")
                      .groupby("shard")
                      .map_groups(dedup_min, batch_format="pandas")
                      .materialize())
        def count_changed(t: pa.Table) -> pa.Table:
            lbl = t["lbl"].to_numpy(zero_copy_only=False)
            old = t["lbl_old"].to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array([int((lbl != old).sum())],
                                           pa.int64())})

        changed = (new_labels.join(labels, join_type="inner",
                                   num_partitions=n_parts, on=("src",),
                                   right_suffix="_old")
                   .map_batches(count_changed, batch_format="pyarrow")
                   .sum("n")) or 0
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError("dup-cluster label propagation did not converge")

    df = labels.to_pandas().rename(columns={"src": "vec_id",
                                            "lbl": "cluster_id"})
    df = df.sort_values("vec_id").reset_index(drop=True)
    return pd.DataFrame({"vec_id": df["vec_id"].astype("int64"),
                         "cluster_id": df["cluster_id"].astype("int64")})


def _dup_clusters_sql() -> str:
    # built lazily: Q_EMBED_DUP_SQL is defined further down the module
    return f"""
WITH RECURSIVE dup AS (
  SELECT a, b FROM ({Q_EMBED_DUP_SQL}) p
), edges AS (
  SELECT a, b FROM dup UNION SELECT b AS a, a AS b FROM dup
), reach AS (
  SELECT a AS v, b AS u FROM edges
  UNION
  SELECT r.v, e.b AS u FROM reach r JOIN edges e ON e.a = r.u
)
SELECT v AS vec_id, CAST(LEAST(v, MIN(u)) AS BIGINT) AS cluster_id
FROM reach GROUP BY v
"""


def q_jaccard_bigram_pairs(sf_dir: str, threshold: float = 0.25,
                           bucket_cap: int = None):  # noqa: E303
    """Near-dup pairs by word-BIGRAM-set Jaccard within each ``source``
    bucket (the n>1 n-gram variant of q_jaccard_pairs; n-grams are far more
    discriminative than unigrams, so the threshold sits lower). Oversized
    buckets triangle-block-decompose like q_jaccard_pairs."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def bigrams(s: str) -> frozenset:
        toks = [x.lower() for x in T.ascii_tokens(s)]
        if len(toks) < 2:
            return frozenset({" ".join(toks)}) if toks else frozenset()
        return frozenset(f"{toks[i]} {toks[i + 1]}"
                         for i in range(len(toks) - 1))

    def prep(g: pd.DataFrame):
        g = g.sort_values("doc_id")
        return g["doc_id"].to_numpy(), [bigrams(t) for t in g["text"]]

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids, sets = prep(g)
        return _jaccard_pair_frame(ids, sets, ids, sets, True, threshold)

    def cross(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        ids_a, sets_a = prep(a)
        ids_b, sets_b = prep(b)
        return _jaccard_pair_frame(ids_a, sets_a, ids_b, sets_b, False,
                                   threshold)

    return _capped_bucket_pairs(docs, "source", "doc_id", pairs, cross,
                                cap=bucket_cap)


Q_JACCARD_BIGRAM_SQL = rf"""
WITH t AS (
  SELECT doc_id, source, {_SQL_LOWER_TOKS} AS toks FROM documents
), bg AS (
  SELECT doc_id, source,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) = 1 THEN [toks[1]]
              ELSE list_distinct(list_transform(
                     generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1])) END AS w
  FROM t
)
SELECT a.doc_id AS a, b.doc_id AS b,
  FLOOR(
    CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
    / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)))
    * 1000000 + 0.5) / 1000000 AS jaccard
FROM bg a JOIN bg b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
      / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.25
"""


# ---------------------------------------------------------------------------
# benchmark decontamination: flag training docs sharing an n-gram with the
# eval split (the standard pre-training hygiene pass; eval suites are small
# and fixed, so their n-gram set is the canonical broadcast side)
# ---------------------------------------------------------------------------

DECON_BENCH_MOD = 50   # doc_id % 50 == 0 → the "benchmark/eval" split
DECON_NGRAM = 4        # real pipelines use ~13; the 31-word synthetic vocab
#                        makes n>=5 a near-always-miss (1 hit at sf0.01), so
#                        4 is the smallest n that stays selective here (19
#                        docs / 40 hits at sf0.01) — same vocab-size
#                        reasoning as Gopher dup3 (quality.py)


def _tok_ngrams(s: str, n: int):
    toks = T.ascii_tokens(s)
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


_BENCH_SET_CACHE: dict = {}


def _bench_set_cached(ref):
    """Per-worker memo of set(ray.get(ref)): ray.get caches the plasma
    object per worker but the O(|bench|) set construction is not free —
    build it once per (worker, broadcast object), not once per batch."""
    import ray
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    s = _BENCH_SET_CACHE.get(key)
    if s is None:
        if len(_BENCH_SET_CACHE) > 4:      # bound worker memory across jobs
            _BENCH_SET_CACHE.clear()
        s = set(ray.get(ref))
        _BENCH_SET_CACHE[key] = s
    return s


def q_decontaminate(sf_dir: str, broadcast_cap: int = None):
    """Per-train-doc count of DISTINCT n-grams shared with the benchmark
    split (docs with any overlap are what a real pipeline drops/flags).

    Scale shape: an eval suite is small by construction at ANY corpus
    scale, so its distinct n-gram set is collected once (streamed,
    cap-guarded) and broadcast via ``ray.put``; the training corpus then
    streams through one vectorized membership pass — no shuffle. If the
    "benchmark" side ever outgrows ``broadcast_cap`` n-grams the query
    cuts over to the exploded distributed join path (q3/q5 discipline;
    forced-tiny-cap parity in test_relational_scale_paths.py)."""
    import ray

    from .relational import BROADCAST_ROW_CAP
    if broadcast_cap is None:
        broadcast_cap = BROADCAST_ROW_CAP
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def bench_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        grams: set = set()
        for i, s in zip(ids, t["text"].to_pylist()):
            if int(i) % DECON_BENCH_MOD == 0:
                grams |= _tok_ngrams(s, DECON_NGRAM)
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    bench_ds = docs.map_batches(bench_partial, batch_format="pyarrow")
    bench: set = set()
    capped = False
    for b in bench_ds.iter_batches(batch_format="pyarrow"):
        bench.update(b["g"].to_pylist())
        if len(bench) > broadcast_cap:
            capped = True
            break
    if capped:
        return _decontaminate_join_fallback(docs, bench_ds)
    bench_ref = ray.put(np.array(sorted(bench), dtype=object))

    def probe(t: pa.Table) -> pa.Table:
        grams = _bench_set_cached(bench_ref)
        out_ids, out_hits = [], []
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for i, s in zip(ids, t["text"].to_pylist()):
            if int(i) % DECON_BENCH_MOD == 0:
                continue
            n_hits = len(_tok_ngrams(s, DECON_NGRAM) & grams)
            if n_hits:
                out_ids.append(int(i))
                out_hits.append(n_hits)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "n_hits": pa.array(out_hits, pa.int64())})

    return docs.map_batches(probe, batch_format="pyarrow")


def _decontaminate_join_fallback(docs, bench_ds):
    """Both-sides-big path: explode train docs to distinct (doc_id, g)
    rows, hash-join the benchmark n-gram set, count hits per doc. The
    shuffle carries only fixed-width (int64, ngram) pairs."""
    import ray
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        out_ids, out_g = [], []
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for i, s in zip(ids, t["text"].to_pylist()):
            if int(i) % DECON_BENCH_MOD == 0:
                continue
            for g in _tok_ngrams(s, DECON_NGRAM):
                out_ids.append(int(i))
                out_g.append(g)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "g": pa.array(out_g, pa.string())})

    train = docs.map_batches(explode, batch_format="pyarrow")
    # bench_ds rows are per-batch-distinct; global-dedup them so the join
    # can't multiply a train row across duplicate bench rows. Dedup is
    # sharded (256 bounded groups via a deterministic crc32 of the
    # n-gram), NOT a groupby over the raw >cap-sized key space — the
    # CLAUDE.md high-cardinality-groupby rule; this path only runs when
    # the bench side exceeds the broadcast cap, i.e. exactly when the key
    # space is huge.
    import zlib as _zlib

    def tag_shard(t: pa.Table) -> pa.Table:
        shards = np.array([_zlib.crc32(g.encode()) & 255
                           for g in t["g"].to_pylist()], dtype=np.int64)
        return t.append_column("shard", pa.array(shards))

    def shard_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": g["g"].unique()})

    bench_unique = (bench_ds.map_batches(tag_shard, batch_format="pyarrow")
                    .groupby("shard")
                    .map_groups(shard_dedup, batch_format="pandas"))
    n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    joined = train.join(bench_unique, join_type="inner",
                        num_partitions=n_parts, on=("g",))

    def partial(t: pa.Table) -> pa.Table:
        tmp = pa.table({"doc_id": t["doc_id"],
                        "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by("doc_id").aggregate([("n", "sum")])

    return (joined.map_batches(partial, batch_format="pyarrow")
                  .groupby("doc_id")
                  .aggregate(Sum("n_sum", alias_name="n_hits")))


def _decon_ngram_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"tok[i + {k}]" for k in range(n))
    return (f"CASE WHEN len(tok) < {n} THEN [] "
            f"ELSE list_distinct(list_transform("
            f"generate_series(1, len(tok) - {n - 1}), i -> {parts})) END")


Q_DECONTAMINATE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, {_sql_tok_array("text")} AS tok FROM documents
),
ng AS (SELECT doc_id, {_decon_ngram_sql(DECON_NGRAM)} AS w FROM toks),
bench AS (
  SELECT DISTINCT unnest(w) AS g FROM ng WHERE doc_id % {DECON_BENCH_MOD} = 0
),
tr AS (
  SELECT doc_id, unnest(w) AS g FROM ng WHERE doc_id % {DECON_BENCH_MOD} <> 0
)
SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM tr JOIN bench USING (g) GROUP BY tr.doc_id
"""


# --- MinHash-LSH near-dup (rows-only; verified in pytest vs brute force) ----

MINHASH_PERMS = 64
LSH_BANDS = 16
LSH_ROWS = MINHASH_PERMS // LSH_BANDS
SHINGLE_K = 5


def _minhash_params(n_perms: int = MINHASH_PERMS) -> np.ndarray:
    """Seeded odd multipliers for wrapping-multiply permutations (mod 2^64)."""
    rng = np.random.default_rng(0x51A17)
    return (rng.integers(0, 1 << 63, size=n_perms, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)


def shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Vectorized 64-bit hashes of the k-byte shingles of the normalized text.

    Normalization matches ``textops.shingles`` (whitespace-collapse +
    lowercase); hashing packs each k-byte window into a uint64 and mixes it
    with a fixed odd multiplier — deterministic, no per-shingle Python work.
    """
    t = " ".join(text.strip().split()).lower()
    data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if data.size == 0:
        return np.array([], dtype=np.uint64)
    if data.size < k:
        win = np.zeros((1, k), dtype=np.uint8)
        win[0, :data.size] = data
    else:
        win = np.lib.stride_tricks.sliding_window_view(data, k)
    powers = (np.uint64(257) ** np.arange(k, dtype=np.uint64))
    packed = (win.astype(np.uint64) * powers[None, :]).sum(axis=1, dtype=np.uint64)
    mixed = packed * np.uint64(0x9E3779B97F4A7C15)
    return np.unique(mixed)


def minhash_signature(text: str, a: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of the wrap-mul permutations."""
    hs = shingle_hashes(text)
    if hs.size == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = hs[:, None] * a[None, :]          # uint64 wrapping multiply
    return vals.min(axis=0)


def minhash_signatures_batch(texts, a: np.ndarray,
                             k: int = SHINGLE_K) -> np.ndarray:
    """Batched ``minhash_signature``: (n_docs, n_perms) uint64, bit-identical
    to stacking the per-doc version (parity test in test_corpus_ops).

    All docs' normalized bytes concatenate into one buffer; window hashes
    are computed in k gathers over the whole buffer (no per-doc numpy-call
    overhead), and per-doc minima come from segmented ``minimum.reduceat``
    over the doc boundaries. Duplicate shingles don't need the per-doc
    ``np.unique`` — the min over a multiset equals the min over its set.
    """
    n = len(texts)
    out = np.full((n, len(a)), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n == 0:
        return out
    bufs = []
    for t in texts:
        s = " ".join(t.strip().split()).lower().encode("utf-8")
        if 0 < len(s) < k:
            s = s + b"\x00" * (k - len(s))   # the short-doc zero-pad window
        bufs.append(s)
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    counts = np.maximum(lens - k + 1, 0)     # 0 for empty docs
    total = int(counts.sum())
    if total == 0:
        return out
    buf = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # grouped arange: window start positions for every doc at once
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    starts = (np.arange(total, dtype=np.int64)
              - np.repeat(cum, counts) + np.repeat(offsets, counts))
    powers = (np.uint64(257) ** np.arange(k, dtype=np.uint64))
    packed = np.zeros(total, dtype=np.uint64)
    for j in range(k):
        packed += buf[starts + j].astype(np.uint64) * powers[j]
    mixed = packed * np.uint64(0x9E3779B97F4A7C15)
    nz = counts > 0
    seg = cum[nz]
    # one contiguous 1-D reduceat per permutation: a 2-D reduceat over a
    # (total, chunk) strided view measured 13x slower (its inner loop walks
    # columns per segment); per-perm the temp is one contiguous (total,)
    # array and the whole min pass runs at memory bandwidth.
    for p in range(len(a)):
        out[nz, p] = np.minimum.reduceat(mixed * a[p], seg)
    return out


MINHASH_PAIR_CAP = 2_000_000
MINHASH_THRESHOLD = 0.5  # default mining threshold (oracle aux stamps key on it)


def q_minhash_pairs(sf_dir: str, threshold: float = MINHASH_THRESHOLD,
                    broadcast_cap: int = MINHASH_PAIR_CAP):
    """MinHash+LSH candidate mining → exact shingle-Jaccard verification.

    Signature/band stages are map_batches; the first shuffle moves only
    (band, bucket, doc_id) triples. Verification never materializes the
    corpus on the driver. Fast path (candidate pairs <= broadcast_cap): the
    PAIR LIST (small side) broadcasts via ray.put, one map over documents
    attaches texts to the pairs each doc participates in, and a bounded
    pair-hash-shard co-group verifies — the only shuffle moves candidate
    docs' texts. Above the cap it cuts over to a hash-partitioned
    Dataset.join of the exploded pair sides against the corpus.
    """
    import ray
    _ensure_aux("minhash_pairs_expected.parquet", sf_dir,
                lambda: _expected_minhash_pairs(sf_dir, threshold),
                extra=f"t={threshold}")
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    a_params = _minhash_params()
    N_SHARDS = 256  # shuffle key: hash-shard of the bucket, NOT the bucket
    # itself — co-locates equal buckets while keeping the group count (and
    # the per-group call overhead) bounded regardless of corpus size

    def bands(t: pa.Table) -> pa.Table:
        n = t.num_rows
        mix = np.uint64(0xC2B2AE3D27D4EB4F)
        sigs = minhash_signatures_batch(t["text"].to_pylist(), a_params)
        sig3 = sigs.reshape(n, LSH_BANDS, LSH_ROWS)
        # fold each band's rows into one 64-bit bucket key (vectorized over
        # every (doc, band) at once)
        bk = sig3[:, :, 0].copy()
        for r in range(1, LSH_ROWS):
            bk = (bk * mix) ^ sig3[:, :, r]
        bucket = bk.reshape(-1)                              # (n*BANDS,)
        doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64), LSH_BANDS)
        band = np.tile(np.arange(LSH_BANDS, dtype=np.int32), n)
        # the full signature rides along (512 B per band row) so the mining
        # groups can estimate-prefilter pairs without another corpus pass or
        # any text movement — FixedSizeBinary straight off the repeated
        # signature matrix, no per-row bytes objects
        sig_rep = np.ascontiguousarray(np.repeat(sigs, LSH_BANDS, axis=0))
        sig_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(sigs.shape[1] * 8), n * LSH_BANDS,
            [None, pa.py_buffer(sig_rep.tobytes())])
        shard = (bucket & np.uint64(N_SHARDS - 1)).astype(np.int64)
        return pa.table({"shard": pa.array(shard),
                         "band": pa.array(band, pa.int32()),
                         "bucket": pa.array(bucket.view(np.int64)),
                         "doc_id": pa.array(doc, pa.int64()),
                         "sig": sig_arr})

    banded = docs.map_batches(bands, batch_format="pyarrow")

    def local_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Bucket-collision pairs, estimate-prefiltered in place: the exact
        64-perm signature estimate (std≈0.0625 at j=0.5) keeps a pair only
        when est >= threshold - MINHASH_EST_MARGIN, killing the banding's
        false positives before anything else moves (precision is still
        exact — survivors get full shingle verification downstream).

        Fully vectorized: one lexsort groups equal (band, bucket) runs,
        triu_indices enumerates each run's pairs, np.unique dedups pairs
        colliding in several bands, and ONE (pairs × perms) equality
        block computes every estimate — no per-pair Python."""
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64")})
        sub = g.drop_duplicates(["band", "bucket", "doc_id"])
        if len(sub) < 2:
            return empty
        doc = sub["doc_id"].to_numpy(dtype=np.int64)
        udocs, uidx = np.unique(doc, return_index=True)
        SIG = np.frombuffer(
            b"".join(sub["sig"].iloc[uidx]), dtype=np.uint64
        ).reshape(len(udocs), -1)
        band = sub["band"].to_numpy(dtype=np.int64)
        bucket = sub["bucket"].to_numpy(dtype=np.int64)
        order = np.lexsort((doc, bucket, band))
        band, bucket, doc = band[order], bucket[order], doc[order]
        row = np.searchsorted(udocs, doc)           # index into SIG
        cut = np.flatnonzero((band[1:] != band[:-1])
                             | (bucket[1:] != bucket[:-1]))
        starts = np.r_[0, cut + 1]
        ends = np.r_[cut + 1, len(doc)]
        ia_parts, ib_parts = [], []
        for s, e in zip(starts, ends):              # O(#buckets) appends only
            m = e - s
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, 1)
            ia_parts.append(row[s:e][ia])
            ib_parts.append(row[s:e][ib])
        if not ia_parts:
            return empty
        ra, rb = np.concatenate(ia_parts), np.concatenate(ib_parts)
        pairs = np.stack([udocs[ra], udocs[rb]], axis=1)
        uniq, first = np.unique(pairs, axis=0, return_index=True)
        est = (SIG[ra[first]] == SIG[rb[first]]).mean(axis=1)
        keep = est >= threshold - MINHASH_EST_MARGIN
        return pd.DataFrame({"a": pd.Series(uniq[keep, 0], dtype="int64"),
                             "b": pd.Series(uniq[keep, 1], dtype="int64")})

    cand = banded.groupby("shard").map_groups(local_pairs,
                                              batch_format="pandas")

    # co-group the two sides of each pair under a BOUNDED shard count
    # (hash of the pair, not the pair itself — same rationale as N_SHARDS)
    PAIR_SHARDS = 64

    def _pshard(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        ps = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
              ^ b.astype(np.uint64)) & np.uint64(PAIR_SHARDS - 1)
        return ps.astype(np.int64)

    def verify_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keep = {"a": [], "b": [], "jaccard": []}
        shingle_cache: dict = {}

        def sh(doc_id, text):
            if doc_id not in shingle_cache:
                shingle_cache[doc_id] = shingle_hashes(text)
            return shingle_cache[doc_id]

        # a pair colliding in several bands lands here several times — the
        # groupby unifies the duplicates so each pair is verified once
        for (x, y), sub in g.groupby(["a", "b"]):
            texts = dict(zip(sub["doc_id"], sub["text"]))
            if len(texts) < 2:
                continue     # half-joined pair (missing doc) — cannot verify
            sa, sb = sh(x, texts[x]), sh(y, texts[y])
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                keep["a"].append(int(x))
                keep["b"].append(int(y))
                keep["jaccard"].append(np.floor(jac * 1e6 + 0.5) / 1e6)
        return pd.DataFrame({"a": pd.Series(keep["a"], dtype="int64"),
                             "b": pd.Series(keep["b"], dtype="int64"),
                             "jaccard": pd.Series(keep["jaccard"],
                                                  dtype="float64")})

    # collect the candidate PAIR list (the small side) with a size guard
    pair_set: set = set()
    over_cap = False
    for bt in cand.iter_batches(batch_format="pyarrow"):
        pair_set.update(zip(bt["a"].to_pylist(), bt["b"].to_pylist()))
        if len(pair_set) > broadcast_cap:
            over_cap = True
            break

    if over_cap:
        survivors = _minhash_verify_join(docs, cand, _pshard, verify_pairs)
    else:
        survivors = _minhash_verify_broadcast(
            docs, sorted(pair_set), a_params, threshold, _pshard,
            verify_pairs)
    return survivors.sort_values(["a", "b"]).reset_index(drop=True)


def q_minhash_dedup(sf_dir: str, threshold: float = MINHASH_THRESHOLD,
                    pair_cap: int = None):
    """End-to-end near-dup DEDUP, keep-first (the D4 semantics at corpus
    scale, driven by MinHash+LSH instead of exact hashes): every document
    maps to the min doc_id of its connected component in the verified-pair
    graph; ``keep=1`` marks the canonical (kept) member, so filtering on
    ``keep`` IS the deduped corpus.

    Composition — each piece keeps its own scale guarantee:
      q_minhash_pairs   banding shuffles only (shard, band, bucket, doc_id,
                        sig) triples; cap-guarded verify with join cutover
      union-find        O(verified pairs · α) on the driver — the pair list
                        is the SMALL side (O(dup rate), not O(corpus));
                        above DUP_CLUSTER_PAIR_CAP it cuts over to
                        _dup_clusters_distributed (min-label propagation)
                        + a partitioned Dataset.join of the label table
                        against the corpus (no dict broadcast), the same
                        discipline as q_dup_clusters — parity-tested with
                        a forced tiny cap
      labeling          fast path: the doc→canonical map (dups only)
                        broadcasts once via ray.put; one streaming map over
                        the corpus attaches canonical_id — the documents
                        table itself is never shuffled or collected.
    """
    import ray
    if pair_cap is None:
        pair_cap = DUP_CLUSTER_PAIR_CAP
    pairs = q_minhash_pairs(sf_dir, threshold)
    docs = read_table(sf_dir, "documents", ["doc_id"])
    if len(pairs) > pair_cap:
        import ray.data as rd
        lab = _dup_clusters_distributed(rd.from_pandas(pairs[["a", "b"]]))
        lab_ds = rd.from_pandas(pd.DataFrame({
            "doc_id": lab["vec_id"].astype("int64"),
            "canon": lab["cluster_id"].astype("int64")}))
        n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        joined = docs.join(lab_ds, join_type="left_outer",
                           num_partitions=n_parts, on=("doc_id",))

        def fill(df: pd.DataFrame) -> pd.DataFrame:
            ids = df["doc_id"].to_numpy(dtype=np.int64)
            can = (df["canon"]
                   .fillna(pd.Series(ids, index=df.index))
                   .to_numpy(dtype=np.int64))
            return pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "canonical_id": pd.Series(can, dtype="int64"),
                "keep": pd.Series((can == ids).astype(np.int64)),
            })

        return joined.map_batches(fill, batch_format="pandas")
    labels = _union_find_labels(pairs)
    canon_ref = ray.put(labels)

    def label(t: pa.Table) -> pa.Table:
        m = ray.get(canon_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        can = np.array([m.get(int(i), int(i)) for i in ids], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "canonical_id": pa.array(can),
            "keep": pa.array((can == ids).astype(np.int64)),
        })

    return docs.map_batches(label, batch_format="pyarrow")


def minhash_dedup_sql(sf_dir: str) -> str:
    """Recursive-CTE mirror: min-reachable-id per member of the expected
    pair graph (the naive-port LSH pairs the q_minhash_pairs oracle gates),
    LEFT-joined to the corpus so singletons keep themselves."""
    return f"""
WITH RECURSIVE dup AS (
  SELECT a, b FROM read_parquet(
    '{aux_dir_for(sf_dir)}/minhash_pairs_expected.parquet')
), edges AS (
  SELECT a, b FROM dup UNION SELECT b AS a, a AS b FROM dup
), reach AS (
  SELECT a AS v, b AS u FROM edges
  UNION
  SELECT r.v, e.b AS u FROM reach r JOIN edges e ON e.a = r.u
), canon AS (
  SELECT v AS doc_id, CAST(LEAST(v, MIN(u)) AS BIGINT) AS canonical_id
  FROM reach GROUP BY v
)
SELECT d.doc_id,
       COALESCE(c.canonical_id, d.doc_id) AS canonical_id,
       CAST(CASE WHEN COALESCE(c.canonical_id, d.doc_id) = d.doc_id
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d LEFT JOIN canon c ON c.doc_id = d.doc_id
"""


# banding at (16 bands × 4 rows) has a shallow S-curve: on a corpus whose
# background Jaccard sits near 0.35 it admits many false-positive candidate
# pairs. The broadcast verify therefore prefilters candidates by the exact
# 64-perm signature estimate (std ≈ 0.0625 at j=0.5; the 0.15 margin keeps
# the miss probability of a true-threshold pair under ~1%) before the exact
# shingle verification — precision stays exact, and only the estimated
# survivors' texts ever move.
MINHASH_EST_MARGIN = 0.15


def _minhash_verify_broadcast(docs, pairs, a_params, threshold,
                              pshard_fn, verify_fn) -> pd.DataFrame:
    """Fast path: the (already estimate-prefiltered, small) pair list lives
    on the driver; one corpus pass attaches texts to the pairs each doc
    participates in; a bounded pair-hash-shard co-group verifies exactly."""
    import ray
    pairs_a = np.fromiter((p[0] for p in pairs), dtype=np.int64,
                          count=len(pairs))
    pairs_b = np.fromiter((p[1] for p in pairs), dtype=np.int64,
                          count=len(pairs))
    doc_to_pairs: dict = {}
    for idx in range(len(pairs_a)):
        doc_to_pairs.setdefault(int(pairs_a[idx]), []).append(idx)
        doc_to_pairs.setdefault(int(pairs_b[idx]), []).append(idx)
    bref = ray.put((pairs_a, pairs_b, doc_to_pairs))

    def attach(t: pa.Table) -> pa.Table:
        pa_, pb_, d2p = ray.get(bref)
        rows = {"a": [], "b": [], "doc_id": [], "text": []}
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            for idx in d2p.get(int(doc_id), ()):
                rows["a"].append(int(pa_[idx]))
                rows["b"].append(int(pb_[idx]))
                rows["doc_id"].append(doc_id)
                rows["text"].append(text)
        ps = pshard_fn(np.asarray(rows["a"], dtype=np.int64),
                       np.asarray(rows["b"], dtype=np.int64))
        return pa.table({"pshard": pa.array(ps),
                         "a": pa.array(rows["a"], pa.int64()),
                         "b": pa.array(rows["b"], pa.int64()),
                         "doc_id": pa.array(rows["doc_id"], pa.int64()),
                         "text": pa.array(rows["text"], pa.string())})

    return (docs.map_batches(attach, batch_format="pyarrow")
            .groupby("pshard").map_groups(verify_fn, batch_format="pandas")
            .to_pandas())


def _minhash_verify_join(docs, cand, pshard_fn, verify_fn) -> pd.DataFrame:
    """Scale path for the verify step: explode pairs to one row per side,
    hash-join the corpus on doc_id, co-group by pair shard."""
    import ray

    def explode_sides(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, b])),
            "a": pa.array(np.concatenate([a, a])),
            "b": pa.array(np.concatenate([b, b])),
        })

    sides = cand.map_batches(explode_sides, batch_format="pyarrow")
    n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    joined = sides.join(docs, join_type="inner", num_partitions=n_parts,
                        on=("doc_id",))

    def tag(t: pa.Table) -> pa.Table:
        ps = pshard_fn(t["a"].to_numpy(zero_copy_only=False),
                       t["b"].to_numpy(zero_copy_only=False))
        return t.append_column("pshard", pa.array(ps))

    return (joined.map_batches(tag, batch_format="pyarrow")
            .groupby("pshard").map_groups(verify_fn, batch_format="pandas")
            .to_pandas())


_MINHASH_EXPECTED_CACHE: dict = {}


def _expected_minhash_pairs(sf_dir: str, threshold: float = MINHASH_THRESHOLD) -> pa.Table:
    """Single-process naive port of the MinHash-LSH mine+verify (the oracle
    discipline used for the extraction golden rows): same shared kernels
    (``shingle_hashes``/``minhash_signature``), same band fold, same
    estimate prefilter, same exact-Jaccard verify — a sequential dict walk
    instead of the banding shuffle. The whole pipeline is deterministic, so
    the distributed result must match this table byte-for-byte at any
    parallelism. Recall vs brute-force exact Jaccard is separately gated in
    pytest (tests/test_corpus_ops.py)."""
    import os

    import pyarrow.parquet as pq
    if sf_dir in _MINHASH_EXPECTED_CACHE:
        return _MINHASH_EXPECTED_CACHE[sf_dir]
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    a_params = _minhash_params()
    mix = np.uint64(0xC2B2AE3D27D4EB4F)
    sigs: dict = {}
    shingles: dict = {}
    buckets: dict = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        full = minhash_signature(text, a_params)
        sigs[doc_id] = full
        shingles[doc_id] = shingle_hashes(text)
        sig = full.reshape(LSH_BANDS, LSH_ROWS)
        bk = sig[:, 0]
        for r in range(1, LSH_ROWS):
            bk = (bk * mix) ^ sig[:, r]
        for band in range(LSH_BANDS):
            buckets.setdefault((band, int(bk[band])), []).append(doc_id)
    keep = {"a": [], "b": [], "jaccard": []}
    seen: set = set()
    for ids in buckets.values():
        if len(ids) < 2:
            continue
        uniq = sorted(set(ids))
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                p = (uniq[i], uniq[j])
                if p in seen:
                    continue
                seen.add(p)
                est = (sigs[p[0]] == sigs[p[1]]).mean()
                if est < threshold - MINHASH_EST_MARGIN:
                    continue
                sa, sb = shingles[p[0]], shingles[p[1]]
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    keep["a"].append(p[0])
                    keep["b"].append(p[1])
                    keep["jaccard"].append(np.floor(jac * 1e6 + 0.5) / 1e6)
    order = np.lexsort((np.asarray(keep["b"]), np.asarray(keep["a"]))) \
        if keep["a"] else np.array([], dtype=np.int64)
    out = pa.table({
        "a": pa.array(np.asarray(keep["a"], dtype=np.int64)[order]),
        "b": pa.array(np.asarray(keep["b"], dtype=np.int64)[order]),
        "jaccard": pa.array(np.asarray(keep["jaccard"],
                                       dtype=np.float64)[order]),
    })
    _MINHASH_EXPECTED_CACHE[sf_dir] = out
    return out


def minhash_pairs_sql(sf_dir: str) -> str:
    return (f"SELECT a, b, jaccard FROM read_parquet("
            f"'{aux_dir_for(sf_dir)}/minhash_pairs_expected.parquet')")


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (md5-derived feature hashes).

    Features are the DISTINCT lowercased ASCII-whitespace tokens (repo rule:
    both engines tokenize identically); each feature's 64-bit hash is the
    big-endian first 8 bytes of its md5 — the same value DuckDB derives via
    ('0x' || substr(md5(w),1,16))::UBIGINT, making the op SQL-oracle-able.
    """
    acc = [0] * 64
    for tok in set(t.lower() for t in T.ascii_tokens(text)):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out


Q_SIMHASH_SQL = rf"""
WITH t AS (
  SELECT doc_id, list_distinct({_SQL_LOWER_TOKS}) AS toks FROM documents
), tok AS (
  SELECT doc_id, unnest(toks) AS w FROM t
), h AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS hv FROM tok
), votes AS (
  SELECT doc_id, s.i,
         SUM(CASE WHEN (hv >> s.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, (SELECT unnest(generate_series(0, 63)) AS i) s
  GROUP BY doc_id, s.i
), sig AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << i ELSE CAST(0 AS HUGEINT) END) AS u
  FROM votes GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(CASE WHEN COALESCE(sig.u, 0) >= CAST(1 AS HUGEINT) << 63
                 THEN COALESCE(sig.u, 0) - (CAST(1 AS HUGEINT) << 64)
                 ELSE COALESCE(sig.u, 0) END AS BIGINT) AS simhash,
       CAST(COALESCE(sig.u, 0) >> 48 AS BIGINT) AS bucket16
FROM t LEFT JOIN sig ON t.doc_id = sig.doc_id
"""


def q_simhash(sf_dir: str):
    """SimHash fingerprints + 16-bit prefix buckets (SQL-oracled via
    md5-hex→UBIGINT bit votes — see Q_SIMHASH_SQL)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        hs = [simhash64(s) for s in t.column("text").to_pylist()]
        # two's-complement reinterpretation keeps all 64 bits (masking bit
        # 63 would conflate fingerprints differing only in the top bit)
        signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hs]
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(signed, pa.int64()),
                         "bucket16": pa.array([h >> 48 for h in hs], pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

def _load_query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    for b in emb.iter_batches(batch_format="pyarrow"):
        ids = b["vec_id"].to_pylist()
        if vec_id in ids:
            return np.array(b["embedding"].to_pylist()[ids.index(vec_id)],
                            dtype=np.float32).astype(np.float64)
    raise KeyError(vec_id)


def _batch_cosines(t: pa.Table, q: np.ndarray) -> np.ndarray:
    """cos = dot(a,q) / (||a||·||q||) in float64 — same formula shape as the
    SQL oracle so only accumulation-order ulps differ (absorbed by round6)."""
    embs = np.array(t.column("embedding").to_pylist(),
                    dtype=np.float32).astype(np.float64)
    dots = embs @ q
    norms = np.sqrt(np.einsum("ij,ij->i", embs, embs))
    qnorm = np.sqrt(np.dot(q, q))
    return dots / (norms * qnorm)


def q_knn_cosine(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k vs vec_id=0: broadcast query, per-batch
    float64 matmul, local top-k, tiny global reduce (S-family baseline)."""
    import ray
    q_ref = ray.put(_load_query_vec(sf_dir))
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def local_topk(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        cos = round6_np(_batch_cosines(t, q))
        tmp = pa.table({"vec_id": t["vec_id"], "cos": pa.array(cos)})
        idx = pc.select_k_unstable(tmp, k=k,
                                   sort_keys=[("cos", "descending"),
                                              ("vec_id", "ascending")])
        return tmp.take(idx)

    df = emb.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return (df.sort_values(["cos", "vec_id"], ascending=[False, True])
              .head(k).reset_index(drop=True))


# note: DuckDB's list_cosine_similarity accumulates in float32 — the oracle
# instead unnests and computes in DOUBLE so both engines do f64 math, and the
# 1e-6 truncation absorbs accumulation-order ulps.
Q_KNN_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
terms AS (
  SELECT e.vec_id,
         CAST(e.embedding[i] AS DOUBLE) AS x,
         CAST(q.qe[i] AS DOUBLE) AS y
  FROM embeddings e, q, generate_series(1, 64) AS t(i)
)
SELECT vec_id,
       FLOOR(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) * 1000000 + 0.5)/1000000 AS cos
FROM terms
GROUP BY vec_id
ORDER BY cos DESC, vec_id ASC
LIMIT 10
"""


def q_embed_dup_pairs(sf_dir: str, threshold: float = 0.4,
                      bucket_cap: int = None):
    """Embedding-cosine near-dup pairs within each label bucket (oversized
    buckets triangle-block-decompose — see ``_capped_bucket_pairs``)."""
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def prep(g: pd.DataFrame):
        g = g.sort_values("vec_id")
        E = np.array(g["embedding"].tolist(),
                     dtype=np.float32).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", E, E))
        return g["vec_id"].to_numpy(), E, norms, int(g["label"].iloc[0])

    def emit(ids_a, ea, norms_a, ids_b, eb, norms_b, label,
             same) -> pd.DataFrame:
        # dot / (|a|·|b|) — the same op order as the SQL oracle's
        # SUM(x*y)/(SQRT(SUM(x*x))*SQRT(SUM(y*y))); do NOT pre-normalize
        # rows (different rounding could flip the 1e-6 truncation)
        S = (ea @ eb.T) / np.outer(norms_a, norms_b)
        # truncate BEFORE thresholding — same order as the old per-pair
        # loop, so borderline cosines keep/drop identically
        C = np.floor(S * 1e6 + 0.5) / 1e6
        mask = C >= threshold
        if same:
            mask &= np.triu(np.ones_like(mask), k=1)
        ii, jj = np.nonzero(mask)
        xa = np.asarray(ids_a, dtype=np.int64)[ii]
        xb = np.asarray(ids_b, dtype=np.int64)[jj]
        return pd.DataFrame({
            "label": pd.Series(np.full(len(ii), label), dtype="int32"),
            "a": pd.Series(np.minimum(xa, xb), dtype="int64"),
            "b": pd.Series(np.maximum(xa, xb), dtype="int64"),
            "cos": pd.Series(C[ii, jj], dtype="float64")})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids, E, norms, label = prep(g)
        return emit(ids, E, norms, ids, E, norms, label, True)

    def cross(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        ids_a, ea, norms_a, label = prep(a)
        ids_b, eb, norms_b, _ = prep(b)
        return emit(ids_a, ea, norms_a, ids_b, eb, norms_b, label, False)

    return _capped_bucket_pairs(emb, "label", "vec_id", pairs, cross,
                                cap=bucket_cap)


Q_EMBED_DUP_SQL = """
WITH pairs AS (
  SELECT a.label AS label, a.vec_id AS a, b.vec_id AS b,
         CAST(a.embedding[i] AS DOUBLE) AS x,
         CAST(b.embedding[i] AS DOUBLE) AS y
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id,
       generate_series(1, 64) AS t(i)
),
cos AS (
  SELECT label, a, b,
         FLOOR(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) * 1000000 + 0.5)/1000000 AS cos
  FROM pairs GROUP BY label, a, b
)
SELECT label, a, b, cos FROM cos WHERE cos >= 0.4e0
"""


IVF_CLUSTERS = 16
IVF_PROBES = 4
IVF_ITERS = 8


def _ivf_centroids(sf_dir: str, k: int = None) -> np.ndarray:
    """Deterministic mini k-means over a driver-side sample (the coarse
    quantizer an IVF index trains once and broadcasts).

    Seeded init + fixed Lloyd iterations + first-index tie-break on empty
    clusters → bit-reproducible centroids. The sample is read directly with
    pyarrow (first 2048 rows in file order) — the training step is
    driver-side by design, so a Ray pass would only add scheduling cost.
    """
    import os

    import pyarrow.parquet as pq
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    sample = []
    for b in pf.iter_batches(batch_size=2048, columns=["embedding"]):
        sample.extend(b.column(0).to_pylist())
        if len(sample) >= 2048:
            break
    x = np.array(sample[:2048], dtype=np.float32).astype(np.float64)
    xn = x / np.sqrt(np.einsum("ij,ij->i", x, x))[:, None]
    rng = np.random.default_rng(0x1F5)
    k = min(IVF_CLUSTERS if k is None else k, len(xn))
    cent = xn[rng.choice(len(xn), size=k, replace=False)]
    for _ in range(IVF_ITERS):
        assign = np.argmax(xn @ cent.T, axis=1)          # cosine on unit vecs
        for c in range(k):
            members = xn[assign == c]
            if len(members):
                m = members.sum(axis=0)
                norm = np.sqrt(np.dot(m, m))
                if norm > 0:
                    cent[c] = m / norm
    return cent


AUX_DIR = "/tmp/dsocr_oracle_aux"


def aux_dir_for(sf_dir: str) -> str:
    """Per-scale aux subdir, keyed by the sf dir's basename.

    Every expected/side table an oracle SQL reads lives under the subdir of
    the sf it was derived from, so an oracle evaluated at one scale can
    never read another scale's expectations — regardless of the order the
    driver interleaves query and oracle execution across sfs.
    """
    import os
    import re
    token = re.sub(r"[^A-Za-z0-9._-]", "_",
                   os.path.basename(sf_dir.rstrip("/"))) or "default"
    return os.path.join(AUX_DIR, token)


def _write_centroids_aux(cent: np.ndarray, sf_dir: str,
                         name: str = "ivf_centroids.parquet") -> None:
    """Publish the (data-derived) IVF centroids for the SQL oracle.

    The centroids are MODEL PARAMETERS shared by both engines (like the
    broadcast in the Ray path); the oracle still independently computes the
    cell assignment, probe-cell pruning, cosine rescoring and top-k. Written
    atomically so a concurrent oracle read never sees a torn file.
    """
    import os

    k, dim = cent.shape
    t = pa.table({
        "c": pa.array(np.repeat(np.arange(k, dtype=np.int64), dim)),
        "i": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), k)),
        "w": pa.array(cent.reshape(-1).astype(np.float64)),
    })
    _write_aux_table(t, name, sf_dir)


def q_ann_ivf(sf_dir: str, k: int = 10):
    """IVF-style ANN (the scale path): broadcast seeded-k-means centroids,
    per-batch assignment, exact rescoring only inside the query's IVF_PROBES
    nearest cells. SQL-oracled: the centroids are published to AUX_DIR and
    the oracle recomputes assignment/pruning/top-k from them independently
    (recall vs brute force additionally tested in pytest)."""
    import ray
    q = _load_query_vec(sf_dir)
    cent = _ivf_centroids(sf_dir)
    _write_centroids_aux(cent, sf_dir)
    qn = q / np.sqrt(np.dot(q, q))
    probe_cells = set(np.argsort(-(cent @ qn), kind="stable")[:IVF_PROBES].tolist())
    state = ray.put((q, cent, probe_cells))

    def cell_topk(t: pa.Table) -> pa.Table:
        qv, c, cells = ray.get(state)
        embs = np.array(t.column("embedding").to_pylist(),
                        dtype=np.float32).astype(np.float64)
        en = embs / np.sqrt(np.einsum("ij,ij->i", embs, embs))[:, None]
        assign = np.argmax(en @ c.T, axis=1)
        keep = np.isin(assign, np.fromiter(cells, dtype=np.int64))
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        cos = round6_np(_batch_cosines(t, qv))
        return pa.table({"vec_id": t["vec_id"], "cos": pa.array(cos)})

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    df = emb.map_batches(cell_topk, batch_format="pyarrow").to_pandas()
    return (df.sort_values(["cos", "vec_id"], ascending=[False, True])
              .head(k).reset_index(drop=True))


LSH_PLANES = 12


def q_ann_lsh(sf_dir: str, k: int = 10):
    """LSH-bucketed ANN (rows-only): seeded random-hyperplane signatures;
    exact rescoring only inside the query's bucket ring (hamming<=1)."""
    import ray
    q = _load_query_vec(sf_dir)
    dim = q.shape[0]
    rng = np.random.default_rng(0xA2217)
    planes = rng.standard_normal((LSH_PLANES, dim))
    q_sig = int("".join("1" if v > 0 else "0" for v in planes @ q), 2)
    near = {q_sig} | {q_sig ^ (1 << i) for i in range(LSH_PLANES)}
    state = ray.put((q, planes, near))

    def bucket_topk(t: pa.Table) -> pa.Table:
        qv, pl, nr = ray.get(state)
        embs = np.array(t.column("embedding").to_pylist(),
                        dtype=np.float32).astype(np.float64)
        sigs = (embs @ pl.T) > 0
        vals = sigs @ (1 << np.arange(LSH_PLANES - 1, -1, -1))
        keep = np.isin(vals, np.fromiter(nr, dtype=np.int64))
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        cos = round6_np(_batch_cosines(t, qv))
        return pa.table({"vec_id": t["vec_id"], "cos": pa.array(cos)})

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    df = emb.map_batches(bucket_topk, batch_format="pyarrow").to_pandas()
    return (df.sort_values(["cos", "vec_id"], ascending=[False, True])
              .head(k).reset_index(drop=True))


def _lsh_planes_sql_values() -> str:
    """The seeded hyperplanes as SQL VALUES rows (j, i, w) — data-independent,
    so they embed as literals and keep the oracle self-contained. repr()
    floats round-trip exactly to the same IEEE doubles in DuckDB."""
    rng = np.random.default_rng(0xA2217)
    planes = rng.standard_normal((LSH_PLANES, 64))
    return ", ".join(f"({j}, {i + 1}, {planes[j, i]!r})"
                     for j in range(LSH_PLANES) for i in range(64))


_SQL_COS_TOPK = """
terms AS (
  SELECT e.vec_id,
         CAST(e.embedding[i] AS DOUBLE) AS x,
         CAST(qe.embedding[i] AS DOUBLE) AS y
  FROM embeddings e
  JOIN cand USING (vec_id)
  JOIN embeddings qe ON qe.vec_id = 0,
       generate_series(1, 64) AS t(i)
)
SELECT vec_id,
       FLOOR(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) * 1000000 + 0.5)/1000000 AS cos
FROM terms
GROUP BY vec_id
ORDER BY cos DESC, vec_id ASC
LIMIT 10
"""

Q_ANN_LSH_SQL = f"""
WITH plane(j, i, w) AS (VALUES {_lsh_planes_sql_values()}),
dots AS (
  SELECT e.vec_id, p.j, SUM(CAST(e.embedding[p.i] AS DOUBLE) * p.w) AS d
  FROM embeddings e, plane p
  GROUP BY e.vec_id, p.j
),
sig AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN d > 0 THEN 1 << (11 - j) ELSE 0 END) AS BIGINT) AS s
  FROM dots GROUP BY vec_id
),
q AS (SELECT s AS qs FROM sig WHERE vec_id = 0),
cand AS (
  SELECT vec_id FROM sig, q WHERE bit_count(xor(s, qs)) <= 1
),
{_SQL_COS_TOPK}
"""

def ann_ivf_sql(sf_dir: str) -> str:
    return f"""
WITH cent AS (SELECT c, i, w FROM read_parquet('{aux_dir_for(sf_dir)}/ivf_centroids.parquet')),
adots AS (
  SELECT e.vec_id, cent.c, SUM(CAST(e.embedding[cent.i] AS DOUBLE) * cent.w) AS d
  FROM embeddings e, cent
  GROUP BY e.vec_id, cent.c
),
assign AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, c ASC) AS rn
    FROM adots) WHERE rn = 1
),
qcells AS (SELECT c FROM adots WHERE vec_id = 0 ORDER BY d DESC, c ASC LIMIT {IVF_PROBES}),
cand AS (
  SELECT vec_id FROM assign WHERE c IN (SELECT c FROM qcells)
),
{_SQL_COS_TOPK}
"""


# ---------------------------------------------------------------------------
# extraction + multimodal over the pages fixture (rows-only)
# ---------------------------------------------------------------------------

_SF_PAGE_ROWS = {"sf0.001": 200, "sf0.01": 1000, "sf0.1": 4000}


def pages_rows_for(sf_dir: str) -> int:
    token = sf_dir.rstrip("/").split("/")[-1]
    return _SF_PAGE_ROWS.get(token, 400)


def _pages_dir_for(sf_dir: str) -> str:
    from ..fixtures.pages import pages_fixture_dir
    return pages_fixture_dir(pages_rows_for(sf_dir))


_GOLDEN_CACHE: dict = {}


def _oracle_golden(sf_dir: str):
    """(pages, golden, size_cuts) from the single-process oracle extractor,
    cached per sf within the session (three queries share it)."""
    import glob

    from ..config import ExtractConfig
    from ..fixtures.pages import pages_table
    from ..oracle import oracle_extract_pages
    from .extract import compute_size_cuts
    n = pages_rows_for(sf_dir)
    if n not in _GOLDEN_CACHE:
        d = _pages_dir_for(sf_dir)
        files = sorted(glob.glob(d + "/*.parquet"))
        cuts = compute_size_cuts(files, ExtractConfig())
        pages = pages_table(n)
        _GOLDEN_CACHE[n] = (pages, oracle_extract_pages(pages), cuts)
    return _GOLDEN_CACHE[n]


def extract_pages_sql(sf_dir: str) -> str:
    return (f"SELECT url, extracted_text, method, n_tiles, size_class, "
            f"html_bytes "
            f"FROM read_parquet('{aux_dir_for(sf_dir)}/extract_expected.parquet')")


def _write_expected_extract(sf_dir: str) -> None:
    """Publish the oracle extractor's per-url golden rows (the byte-identity
    contract) for the driver gate to hash against the Ray pipeline.
    Stamp-skipped: the oracle extractor is the expensive naive port."""

    def build() -> pa.Table:
        from ..stages.dom import size_class_of
        pages, golden, cuts = _oracle_golden(sf_dir)
        html_lens = [len(h) for h in pages.column("html").to_pylist()]
        return pa.table({
            "url": golden.column("url"),
            "extracted_text": golden.column("extracted_text"),
            "method": golden.column("method"),
            "n_tiles": golden.column("n_tiles"),
            "size_class": pa.array([size_class_of(L, cuts)
                                    for L in html_lens], pa.int32()),
            "html_bytes": pa.array(html_lens, pa.int64()),
        })

    _ensure_aux("extract_expected.parquet", sf_dir, build)


def x_extract_pages(sf_dir: str):
    """The flagship pipeline as a query: pages fixture sized by sf.
    SQL-oracled against the single-process oracle extractor's golden rows
    (byte-identical extracted_text per url — the core contract)."""
    import glob
    from .extract import build_extract_dataset
    d = _pages_dir_for(sf_dir)
    _write_expected_extract(sf_dir)
    ds = build_extract_dataset(sorted(glob.glob(d + "/*.parquet")))
    return ds.select_columns(["url", "extracted_text", "method", "n_tiles",
                              "size_class", "html_bytes"])


def _aux_code_stamp() -> str:
    """md5 over every source file the expected tables derive from — the
    skip key for ``prepare_oracle_aux`` (fixtures and kernels are
    deterministic, so unchanged code ⇒ byte-identical aux)."""
    import hashlib as _hl
    import os
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = [os.path.join(pkg, "pipelines", "corpus.py"),
             os.path.join(pkg, "pipelines", "extract.py"),
             os.path.join(pkg, "oracle.py"),
             os.path.join(pkg, "config.py")]
    for sub in ("functions", "stages", "fixtures"):
        d = os.path.join(pkg, sub)
        paths.extend(os.path.join(d, n) for n in sorted(os.listdir(d))
                     if n.endswith(".py"))
    h = _hl.md5()
    for p in paths:
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def prepare_oracle_aux(sf_dir: str, force: bool = False) -> None:
    """Refresh every oracle side-table under ``aux_dir_for(sf_dir)``.

    Called from ``__ray_entry__.oracle_sql()`` for every existing sf dir so
    the aux parquet the SQL strings read exists and matches its sf even if
    the driver evaluates the oracle BEFORE running the Ray queries (each
    query also rewrites its own aux on execution). Pure Python/pyarrow — no
    Ray session needed. Skips the (expensive: ~70 s at sf0.1) rebuild when
    a stamp shows the deriving source files are unchanged since the last
    build."""
    import os
    stamp = _aux_code_stamp()
    stamp_path = os.path.join(aux_dir_for(sf_dir), "_STAMP")
    if not force and os.path.exists(stamp_path):
        try:
            with open(stamp_path) as f:
                if f.read() == stamp:
                    return
        except OSError:
            pass
    # every multi-writer aux goes through _ensure_aux with the SAME
    # builder/extra the query-side call uses, so the per-file stamps stay
    # truthful (a direct _write_aux_table here would leave a stale stamp
    # and a later non-default-parameter query call would skip against the
    # wrong expected content)
    _ensure_payload_meta_aux(sf_dir)
    _write_expected_thumbnails(sf_dir)
    _ensure_aux("features_expected.parquet", sf_dir,
                lambda: _expected_features_frames(sf_dir)[0])
    _ensure_aux("frames_expected.parquet", sf_dir,
                lambda: _expected_features_frames(sf_dir)[1])
    _write_expected_extract(sf_dir)
    _ensure_aux("manifest_expected.parquet", sf_dir,
                lambda: _expected_manifest_table(sf_dir))
    _write_expected_corpus_summary(sf_dir)
    _write_centroids_aux(_ivf_centroids(sf_dir), sf_dir)
    sk = semdedup_k(sf_dir)
    _write_centroids_aux(_ivf_centroids(sf_dir, k=sk), sf_dir,
                         _semdedup_cent_name(sk))
    _ensure_aux("minhash_pairs_expected.parquet", sf_dir,
                lambda: _expected_minhash_pairs(sf_dir),
                extra=f"t={MINHASH_THRESHOLD}")
    _ensure_jpeg_aux(sf_dir)
    with open(stamp_path + ".tmp", "w") as f:
        f.write(stamp)
    os.replace(stamp_path + ".tmp", stamp_path)


def _write_aux_table(t: pa.Table, name: str, sf_dir: str) -> None:
    """Atomically publish an expected/aux table for a SQL oracle to read
    (under the per-scale subdir — see ``aux_dir_for``)."""
    import os

    import pyarrow.parquet as pq
    d = aux_dir_for(sf_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, name)
    pq.write_table(t, path + ".tmp")
    os.replace(path + ".tmp", path)


def _ensure_aux(name: str, sf_dir: str, builder, extra: str = "") -> None:
    """Build+publish one aux table only when stale, keyed by a per-file
    stamp (code stamp + ``extra`` for builder parameters). The per-query
    aux rewrites exist so the SQL oracle always matches the code that just
    ran — but the builders are single-process naive ports (2.5 s for the
    minhash pairs, tens of seconds for the oracle extractor at sf0.1), so
    an unconditional rebuild on every query call taxes benchmarks and warm
    gates. Deterministic builders ⇒ unchanged code ⇒ byte-identical aux,
    so the stamp skip is exact. Concurrent rebuilds are safe (atomic
    same-content publishes).

    The stamp also folds in the resolved sf path and the (size, mtime) of
    every parquet directly under it: aux dirs are keyed by the sf BASENAME
    (aux_dir_for), and pytest tmp dirs reuse basenames across runs — a
    regenerated same-name corpus must rebuild, never read a predecessor's
    expectations. (A touched-but-identical input just causes one spare
    rebuild — safe direction.)"""
    import os
    sig = [os.path.realpath(sf_dir)]
    try:
        for e in sorted(os.scandir(sf_dir), key=lambda e: e.name):
            if e.name.endswith(".parquet"):
                st = e.stat()
                sig.append(f"{e.name}:{st.st_size}:{st.st_mtime_ns}")
    except OSError:
        pass
    stamp = (_aux_code_stamp() + "|" + "|".join(sig)
             + (":" + extra if extra else ""))
    d = aux_dir_for(sf_dir)
    spath = os.path.join(d, name + ".stamp")
    if os.path.exists(os.path.join(d, name)):
        try:
            with open(spath) as f:
                if f.read() == stamp:
                    return
        except OSError:
            pass
    _write_aux_table(builder(), name, sf_dir)
    with open(spath + ".tmp", "w") as f:
        f.write(stamp)
    os.replace(spath + ".tmp", spath)


def payload_meta_sql(sf_dir: str) -> str:
    return (f"SELECT url, width, height, glyph_scale, nbytes "
            f"FROM read_parquet('{aux_dir_for(sf_dir)}/payload_meta_expected.parquet')")

_PAYLOADS_CACHE: dict = {}


def _ocr_payload_metas(sf_dir: str) -> list:
    """Generator-side payload metadata+bytes for every OCR-routed fixture
    row, computed once per session (four expected-table builders share it)."""
    from ..fixtures.pages import gen_page, is_ocr_row, page_url
    n = pages_rows_for(sf_dir)
    if n not in _PAYLOADS_CACHE:
        _PAYLOADS_CACHE[n] = [gen_page(i)["payload_meta"]
                              for i in range(n) if is_ocr_row(page_url(i))]
    return _PAYLOADS_CACHE[n]


def _ensure_payload_meta_aux(sf_dir: str) -> None:
    def build() -> pa.Table:
        metas = _ocr_payload_metas(sf_dir)
        return pa.table({
            "url": pa.array([m["url"] for m in metas], pa.string()),
            "width": pa.array([m["width"] for m in metas], pa.int64()),
            "height": pa.array([m["height"] for m in metas], pa.int64()),
            "glyph_scale": pa.array([m["glyph_scale"] for m in metas],
                                    pa.int64()),
            "nbytes": pa.array([m["nbytes"] for m in metas], pa.int64()),
        })

    _ensure_aux("payload_meta_expected.parquet", sf_dir, build)


def x_payload_meta(sf_dir: str):
    """Multimodal metadata probe: RAW2 headers of the raster payloads
    (no decompression — the cheap schema pass over an opaque binary col).

    SQL-oracled against the GENERATOR's expected header table (written to
    AUX_DIR here): the fixture knows what it encoded; the pipeline's DOM
    walk + header parse must reproduce it."""
    import glob
    import ray.data
    from ..functions.dom import extract_dom
    from ..functions.raster import payload_meta
    _ensure_payload_meta_aux(sf_dir)
    d = _pages_dir_for(sf_dir)
    pages = ray.data.read_parquet(sorted(glob.glob(d + "/*.parquet")),
                                  columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        rows = {"url": [], "width": [], "height": [], "glyph_scale": [],
                "nbytes": []}
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            res = extract_dom(html)
            if res["payload"] is None:
                continue
            meta = payload_meta(res["payload"])
            if meta is None:
                continue
            rows["url"].append(url)
            rows["width"].append(meta["width"])
            rows["height"].append(meta["height"])
            rows["glyph_scale"].append(meta["glyph_scale"])
            rows["nbytes"].append(meta["nbytes"])
        return pa.table({"url": pa.array(rows["url"]),
                         "width": pa.array(rows["width"], pa.int64()),
                         "height": pa.array(rows["height"], pa.int64()),
                         "glyph_scale": pa.array(rows["glyph_scale"], pa.int64()),
                         "nbytes": pa.array(rows["nbytes"], pa.int64())})

    return pages.map_batches(f, batch_format="pyarrow")


def _payload_dataset(sf_dir: str):
    """(url, payload) rows for the OCR-routed pages of the sf fixture."""
    import glob
    import ray.data
    from ..functions.dom import extract_dom
    d = _pages_dir_for(sf_dir)
    pages = ray.data.read_parquet(sorted(glob.glob(d + "/*.parquet")),
                                  columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls, payloads = [], []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            res = extract_dom(html)
            if res["payload"] is not None:
                urls.append(url)
                payloads.append(res["payload"])
        return pa.table({"url": pa.array(urls, pa.string()),
                         "payload": pa.array(payloads, pa.binary())})

    return pages.map_batches(f, batch_format="pyarrow")


# the thumb BYTES are compared via md5 hex (byte equality): DuckDB's
# fetchdf materializes raw BLOB columns as unhashable bytearrays, which no
# value-hash gate can handle — so the expected table stores the fingerprint
def thumbnails_sql(sf_dir: str) -> str:
    return (f"SELECT url, thumb_md5, thumb_bytes, orig_width, orig_height "
            f"FROM read_parquet('{aux_dir_for(sf_dir)}/thumbs_expected.parquet')")


_THUMBS_CACHE: dict = {}


def _write_expected_thumbnails(sf_dir: str) -> None:
    """Single-process expected thumbnails straight from the GENERATOR's
    payload bytes (no DOM walk): decode → bicubic 64px → re-encode. The
    bicubic kernel's independence is covered by the naive-port parity
    pytest; this table pins the distributed stage's end-to-end bytes.
    Stamp-skipped (per-payload decode+resize is the cost)."""

    def build() -> pa.Table:
        import hashlib as _hl

        from ..functions.imageops import resize_bicubic
        from ..functions.raster import decode_payload, encode_payload
        n = pages_rows_for(sf_dir)
        if n in _THUMBS_CACHE:
            return _THUMBS_CACHE[n]
        rows = {"url": [], "thumb_md5": [], "thumb_bytes": [],
                "orig_width": [], "orig_height": []}
        for meta in _ocr_payload_metas(sf_dir):
            img, scale, margin = decode_payload(meta["payload"])
            small = resize_bicubic(img, 64, 64)
            thumb = encode_payload(small, scale, margin)
            rows["url"].append(meta["url"])
            rows["thumb_md5"].append(_hl.md5(thumb).hexdigest())
            rows["thumb_bytes"].append(len(thumb))
            rows["orig_width"].append(img.shape[1])
            rows["orig_height"].append(img.shape[0])
        t = pa.table({
            "url": pa.array(rows["url"], pa.string()),
            "thumb_md5": pa.array(rows["thumb_md5"], pa.string()),
            "thumb_bytes": pa.array(rows["thumb_bytes"], pa.int64()),
            "orig_width": pa.array(rows["orig_width"], pa.int64()),
            "orig_height": pa.array(rows["orig_height"], pa.int64()),
        })
        _THUMBS_CACHE[n] = t
        return t

    _ensure_aux("thumbs_expected.parquet", sf_dir, build)


def x_image_thumbnails(sf_dir: str):
    """Multimodal resize stage: RAW2 decode → 64px bicubic thumb → re-encode
    (actor pool; binary in/out). SQL-oracled against the generator-side
    expected thumbs with the bytes fingerprinted as md5 hex (byte equality;
    raw BLOBs come out of DuckDB as unhashable bytearrays)."""
    import hashlib

    from ..stages.multimodal import ImageResizeStage
    _write_expected_thumbnails(sf_dir)
    ds = _payload_dataset(sf_dir)
    thumbs = ds.map_batches(ImageResizeStage,
                            fn_constructor_kwargs={"thumb": 64},
                            batch_format="pyarrow", batch_size=16,
                            concurrency=2)

    def fingerprint(t: pa.Table) -> pa.Table:
        blobs = t["thumb"].to_pylist()
        return pa.table({
            "url": t["url"],
            "thumb_md5": pa.array([hashlib.md5(b).hexdigest()
                                   for b in blobs], pa.string()),
            "thumb_bytes": pa.array([len(b) for b in blobs], pa.int64()),
            "orig_width": t["orig_width"],
            "orig_height": t["orig_height"],
        })

    return thumbs.map_batches(fingerprint, batch_format="pyarrow")


def _feat_md5(vec) -> str:
    import hashlib as _hl
    return _hl.md5(np.asarray(vec, dtype=np.float32).tobytes()).hexdigest()


def _fingerprint_features(t: pa.Table) -> pa.Table:
    vecs = t["features"].to_pylist()
    cols = {"url": t["url"]}
    if "frame_index" in t.column_names:
        cols["frame_index"] = t["frame_index"]
    cols["n_dims"] = pa.array([len(v) for v in vecs], pa.int64())
    cols["features_md5"] = pa.array([_feat_md5(v) for v in vecs], pa.string())
    return pa.table(cols)


def features_sql(sf_dir: str) -> str:
    return (f"SELECT url, n_dims, features_md5 "
            f"FROM read_parquet('{aux_dir_for(sf_dir)}/features_expected.parquet')")


def frames_sql(sf_dir: str) -> str:
    return (f"SELECT url, frame_index, n_dims, features_md5 "
            f"FROM read_parquet('{aux_dir_for(sf_dir)}/frames_expected.parquet')")

_FEATURES_CACHE: dict = {}


def _expected_features_frames(sf_dir: str):
    """Generator-side expected features/frames: decode the generator's own
    payload bytes, run the (pytest-covered) feature kernels single-process,
    fingerprint the float32 vectors (vector equality; list columns are not
    value-hashable through fetchdf)."""
    from ..functions.raster import decode_payload
    from ..stages.multimodal import image_features
    n = pages_rows_for(sf_dir)
    if n in _FEATURES_CACHE:
        return _FEATURES_CACHE[n]
    feat = {"url": [], "n_dims": [], "features_md5": []}
    frames = {"url": [], "frame_index": [], "n_dims": [], "features_md5": []}
    for meta in _ocr_payload_metas(sf_dir):
        img, _s, _m = decode_payload(meta["payload"])
        v = image_features(img)
        feat["url"].append(meta["url"])
        feat["n_dims"].append(len(v))
        feat["features_md5"].append(_feat_md5(v))
        n_frames = max(img.shape[0] // 64, 1)
        for tdx in range(0, n_frames, 2):
            frame = img[tdx * 64:(tdx + 1) * 64]
            if frame.size == 0:
                continue
            fv = image_features(frame)
            frames["url"].append(meta["url"])
            frames["frame_index"].append(tdx)
            frames["n_dims"].append(len(fv))
            frames["features_md5"].append(_feat_md5(fv))
    ft = pa.table({"url": pa.array(feat["url"], pa.string()),
                   "n_dims": pa.array(feat["n_dims"], pa.int64()),
                   "features_md5": pa.array(feat["features_md5"], pa.string())})
    rt = pa.table({"url": pa.array(frames["url"], pa.string()),
                   "frame_index": pa.array(frames["frame_index"], pa.int64()),
                   "n_dims": pa.array(frames["n_dims"], pa.int64()),
                   "features_md5": pa.array(frames["features_md5"], pa.string())})
    _FEATURES_CACHE[n] = (ft, rt)
    return ft, rt


def x_image_features(sf_dir: str):
    """Multimodal feature-extract stage: payload → list<float> embedding
    (SQL-oracled via float32-byte fingerprints vs the generator-side
    expected vectors)."""
    from ..stages.multimodal import ImageFeatureStage
    _ensure_aux("features_expected.parquet", sf_dir,
                lambda: _expected_features_frames(sf_dir)[0])
    ds = _payload_dataset(sf_dir)
    feats = ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                           batch_size=32, concurrency=2)
    return feats.map_batches(_fingerprint_features, batch_format="pyarrow")


def x_frame_samples(sf_dir: str):
    """Multimodal frame-sample stage (deterministic raw2 clip fake;
    SQL-oracled via per-frame feature fingerprints)."""
    from ..stages.multimodal import FrameSampleStage
    _ensure_aux("frames_expected.parquet", sf_dir,
                lambda: _expected_features_frames(sf_dir)[1])
    ds = _payload_dataset(sf_dir)
    frames = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                            fn_constructor_kwargs={"frame_h": 64, "stride": 2},
                            batch_size=32, concurrency=2)
    return frames.map_batches(_fingerprint_features, batch_format="pyarrow")


def png_features_sql(sf_dir: str) -> str:
    # PNG encode→decode is lossless, so the expected vectors are byte-
    # identical to the RAW2 feature expectations — same side-table.
    return features_sql(sf_dir)


def _ensure_png_inputs_aux(sf_dir: str) -> None:
    """Deterministic real-format input table: every OCR payload image
    re-encoded as a PNG carried in a base64 data-URL string column — the
    reference's real-image ingestion shapes (image::open file bytes,
    crates/cli/src/app.rs:136-149; base64 data-URLs,
    crates/server/src/generation.rs:284-298) synthesized at small scale."""

    def build() -> pa.Table:
        import base64

        from ..functions.png import encode_png
        from ..functions.raster import decode_payload
        urls, srcs = [], []
        for meta in _ocr_payload_metas(sf_dir):
            img, _s, _m = decode_payload(meta["payload"])
            b = encode_png(img)
            urls.append(meta["url"])
            srcs.append("data:image/png;base64,"
                        + base64.b64encode(b).decode())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "src": pa.array(srcs, pa.string())})

    _ensure_aux("png_inputs.parquet", sf_dir, build)


def x_png_features(sf_dir: str):
    """Real image format end-to-end: base64 data-URL → PNG decode
    (functions/png.py, spec-implemented on stdlib zlib) → feature vectors,
    SQL-oracled against the RAW2 generator's expected feature fingerprints
    — a cross-codec equality check (the PNG round trip must reproduce the
    generator's pixels exactly for the float32 fingerprints to match)."""
    import os as _os

    import ray.data

    from ..functions.png import parse_data_url
    from ..stages.multimodal import ImageFeatureStage
    _ensure_png_inputs_aux(sf_dir)
    _ensure_aux("features_expected.parquet", sf_dir,
                lambda: _expected_features_frames(sf_dir)[0])
    ds = ray.data.read_parquet(
        _os.path.join(aux_dir_for(sf_dir), "png_inputs.parquet"))

    def to_payload(t: pa.Table) -> pa.Table:
        payloads = []
        for src in t["src"].to_pylist():
            mime, b = parse_data_url(src)
            payloads.append(b if mime == "image/png" else None)
        return pa.table({"url": t["url"],
                         "payload": pa.array(payloads, pa.binary())})

    # task workers (instance, not actor pool): the stage is stateless and
    # an actor pool respawns per execution (BASELINE.md round-3 A/B)
    feats = (ds.map_batches(to_payload, batch_format="pyarrow")
               .map_batches(ImageFeatureStage(), batch_format="pyarrow",
                            batch_size=32))
    return feats.map_batches(_fingerprint_features, batch_format="pyarrow")


def apng_frames_sql(sf_dir: str) -> str:
    # APNG frames decode losslessly to the RAW2 clip's frame slabs, so the
    # expected per-frame fingerprints are the same side-table.
    return frames_sql(sf_dir)


def _ensure_apng_inputs_aux(sf_dir: str) -> None:
    """Real multi-frame container inputs: each OCR payload's RAW2 clip
    (vertical 64px frame stack) re-encoded as an APNG — the animated-PNG
    standard, decodable on stdlib zlib (functions/png.py)."""

    def build() -> pa.Table:
        from ..functions.png import encode_apng
        from ..functions.raster import decode_payload
        urls, payloads = [], []
        for meta in _ocr_payload_metas(sf_dir):
            img, _s, _m = decode_payload(meta["payload"])
            n_frames = max(img.shape[0] // 64, 1)
            frames = [img[t * 64:(t + 1) * 64] for t in range(n_frames)]
            urls.append(meta["url"])
            payloads.append(encode_apng(frames))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "payload": pa.array(payloads, pa.binary())})

    _ensure_aux("apng_inputs.parquet", sf_dir, build)


def x_apng_frames(sf_dir: str):
    """Real multi-frame container end-to-end: APNG decode → per-frame
    features, SQL-oracled against the RAW2 clip fake's expected per-frame
    fingerprints — cross-container equality (the APNG round trip must
    reproduce every frame slab's pixels exactly)."""
    import os as _os

    import ray.data

    from ..stages.multimodal import FrameSampleStage
    _ensure_apng_inputs_aux(sf_dir)
    _ensure_aux("frames_expected.parquet", sf_dir,
                lambda: _expected_features_frames(sf_dir)[1])
    ds = ray.data.read_parquet(
        _os.path.join(aux_dir_for(sf_dir), "apng_inputs.parquet"))
    frames = ds.map_batches(
        FrameSampleStage(frame_h=64, stride=2, codec="apng"),
        batch_format="pyarrow", batch_size=32)
    return frames.map_batches(_fingerprint_features, batch_format="pyarrow")


JPEG_INPUT_QUALITY = 85
JPEG_SAMPLE_EVERY = 6   # codec-validation op, not a throughput op: the aux
#                         builder runs the codec single-process (oracle
#                         side), so the input set is a deterministic sample
#                         of the OCR payloads (every 6th, min 8) to keep
#                         prepare_oracle_aux bounded (~1.4 s/image)


def jpeg_features_sql(sf_dir: str) -> str:
    # JPEG is LOSSY: the expected fingerprints come from the same
    # single-process decode of the same bytes (thumbs_expected discipline),
    # pinning distributed == single-process — not pre-compression pixels.
    return (f"SELECT url, n_dims, features_md5 FROM read_parquet("
            f"'{aux_dir_for(sf_dir)}/jpeg_features_expected.parquet')")


_JPEG_CACHE: dict = {}


# encode-mode cycle: each sampled input exercises a different stream shape
# (baseline, progressive SOF2, 4:2:0, DRI/RSTn, progressive 4:2:2) so the
# distributed decode stage covers the full from-spec decoder surface
_JPEG_MODES = [
    {},
    {"progressive": True},
    {"subsampling": "4:2:0"},
    {"restart_interval": 4},
    {"subsampling": "4:2:2", "progressive": True},
]


def _jpeg_tables(sf_dir: str):
    """(inputs, expected) pair: generator images → JPEG bytes (mode cycled
    per _JPEG_MODES), plus single-process decode→feature fingerprints of
    those bytes."""
    from ..functions.jpeg import decode_jpeg, encode_jpeg
    from ..functions.raster import decode_payload
    from ..stages.multimodal import image_features
    n = pages_rows_for(sf_dir)
    if n in _JPEG_CACHE:
        return _JPEG_CACHE[n]
    inp = {"url": [], "payload": []}
    exp = {"url": [], "n_dims": [], "features_md5": []}
    metas = _ocr_payload_metas(sf_dir)
    step = JPEG_SAMPLE_EVERY if len(metas) > 8 * JPEG_SAMPLE_EVERY else \
        max(1, len(metas) // 8)
    for i, meta in enumerate(metas[::step]):
        img, _s, _m = decode_payload(meta["payload"])
        jb = encode_jpeg(img, JPEG_INPUT_QUALITY,
                         **_JPEG_MODES[i % len(_JPEG_MODES)])
        v = image_features(decode_jpeg(jb))
        inp["url"].append(meta["url"])
        inp["payload"].append(jb)
        exp["url"].append(meta["url"])
        exp["n_dims"].append(len(v))
        exp["features_md5"].append(_feat_md5(v))
    pair = (pa.table({"url": pa.array(inp["url"], pa.string()),
                      "payload": pa.array(inp["payload"], pa.binary())}),
            pa.table({"url": pa.array(exp["url"], pa.string()),
                      "n_dims": pa.array(exp["n_dims"], pa.int64()),
                      "features_md5": pa.array(exp["features_md5"],
                                               pa.string())}))
    _JPEG_CACHE[n] = pair
    return pair


def _ensure_jpeg_aux(sf_dir: str) -> None:
    extra = (f"q={JPEG_INPUT_QUALITY},s={JPEG_SAMPLE_EVERY},"
             f"m={len(_JPEG_MODES)}v2")
    _ensure_aux("jpeg_inputs.parquet", sf_dir,
                lambda: _jpeg_tables(sf_dir)[0], extra=extra)
    _ensure_aux("jpeg_features_expected.parquet", sf_dir,
                lambda: _jpeg_tables(sf_dir)[1], extra=extra)


def x_jpeg_features(sf_dir: str):
    """Lossy real image format end-to-end: JPEG decode (functions/jpeg.py —
    spec-implemented: baseline + progressive SOF2, 4:2:0/4:2:2, DRI/RSTn;
    inputs cycle every mode via _JPEG_MODES) → feature vectors, SQL-oracled
    against the single-process decode of the same bytes (the
    thumbs_expected pattern for lossy codecs)."""
    import os as _os

    import ray.data

    from ..stages.multimodal import ImageFeatureStage
    _ensure_jpeg_aux(sf_dir)
    ds = ray.data.read_parquet(
        _os.path.join(aux_dir_for(sf_dir), "jpeg_inputs.parquet"))
    # batch_size=1: ~1 s of pure-Python Huffman/IDCT per payload — one row
    # per task keeps the decode wide instead of serialized in one batch
    feats = ds.map_batches(ImageFeatureStage(), batch_format="pyarrow",
                           batch_size=1)
    return feats.map_batches(_fingerprint_features, batch_format="pyarrow")


AVI_FPS = 10


def avi_frames_sql(sf_dir: str) -> str:
    # MJPEG is LOSSY: expected per-frame fingerprints come from the
    # single-process decode of the same AVI bytes (thumbs_expected
    # discipline), like x_jpeg_features.
    return (f"SELECT url, frame_index, n_dims, features_md5 FROM "
            f"read_parquet('{aux_dir_for(sf_dir)}"
            f"/avi_frames_expected.parquet')")


_AVI_CACHE: dict = {}


def _avi_tables(sf_dir: str):
    """(inputs, expected): each sampled OCR clip (vertical 64px frame
    stack) re-encoded as an MJPEG AVI (functions/avi.py — a real RIFF
    video container, JPEG per frame), plus single-process frame-sample
    fingerprints of those bytes."""
    from ..functions.avi import encode_avi_mjpeg
    from ..functions.raster import decode_payload
    from ..stages.multimodal import FrameSampleStage
    n = pages_rows_for(sf_dir)
    if n in _AVI_CACHE:
        return _AVI_CACHE[n]
    urls, payloads = [], []
    metas = _ocr_payload_metas(sf_dir)
    step = JPEG_SAMPLE_EVERY if len(metas) > 8 * JPEG_SAMPLE_EVERY else \
        max(1, len(metas) // 8)
    for meta in metas[::step]:
        img, _s, _m = decode_payload(meta["payload"])
        n_frames = max(img.shape[0] // 64, 1)
        frames = [img[t * 64:(t + 1) * 64] for t in range(n_frames)]
        urls.append(meta["url"])
        payloads.append(encode_avi_mjpeg(frames, fps=AVI_FPS,
                                         quality=JPEG_INPUT_QUALITY))
    inputs = pa.table({"url": pa.array(urls, pa.string()),
                       "payload": pa.array(payloads, pa.binary())})
    stage = FrameSampleStage(frame_h=64, stride=2, codec="avi")
    expected = _fingerprint_features(stage(inputs))
    _AVI_CACHE[n] = (inputs, expected)
    return inputs, expected


def _ensure_avi_aux(sf_dir: str) -> None:
    extra = f"q={JPEG_INPUT_QUALITY},s={JPEG_SAMPLE_EVERY},fps={AVI_FPS}"
    _ensure_aux("avi_inputs.parquet", sf_dir,
                lambda: _avi_tables(sf_dir)[0], extra=extra)
    _ensure_aux("avi_frames_expected.parquet", sf_dir,
                lambda: _avi_tables(sf_dir)[1], extra=extra)


def x_avi_frames(sf_dir: str):
    """Real VIDEO container end-to-end: MJPEG AVI (RIFF) → per-frame JPEG
    decode → frame-sampled features, SQL-oracled against the
    single-process decode of the same bytes. Extends the multimodal
    surface past images: mp4/webm keep fail-fast sample decode (no H.264
    here) while the container layer is real (functions/mp4.py)."""
    import os as _os

    import ray.data

    from ..stages.multimodal import FrameSampleStage
    _ensure_avi_aux(sf_dir)
    ds = ray.data.read_parquet(
        _os.path.join(aux_dir_for(sf_dir), "avi_inputs.parquet"))
    frames = ds.map_batches(
        FrameSampleStage(frame_h=64, stride=2, codec="avi"),
        batch_format="pyarrow", batch_size=1)
    return frames.map_batches(_fingerprint_features, batch_format="pyarrow")


def mp4_meta_sql(sf_dir: str) -> str:
    # GROUND-TRUTH oracle: the expected values are derived arithmetically
    # from the generator's payload dims (width, height, frames->duration),
    # independent of the parser under test.
    return (f"SELECT url, brand, duration_ms, n_tracks, codec, width, "
            f"height FROM read_parquet('{aux_dir_for(sf_dir)}"
            f"/mp4_expected.parquet')")


def _ensure_mp4_aux(sf_dir: str) -> None:
    """Inputs: deterministic ISO-BMFF skeletons synthesized from each OCR
    payload's known dims (functions/mp4.py::encode_mp4_skeleton); expected:
    the same metadata tabulated directly from the generator — so the
    distributed box parser is checked against ground truth, not itself."""

    def tables():
        from ..functions.mp4 import encode_mp4_skeleton
        urls, payloads = [], []
        exp = {"url": [], "brand": [], "duration_ms": [], "n_tracks": [],
               "codec": [], "width": [], "height": []}
        for i, meta in enumerate(_ocr_payload_metas(sf_dir)):
            w, h = meta["width"], meta["height"]
            n_frames = max(h // 64, 1)
            dur = n_frames * 1000 // AVI_FPS
            codec = ["avc1", "hev1", "av01"][i % 3]
            urls.append(meta["url"])
            payloads.append(encode_mp4_skeleton(w, h, dur, codec=codec))
            exp["url"].append(meta["url"])
            exp["brand"].append("isom")
            exp["duration_ms"].append(dur)
            exp["n_tracks"].append(1)
            exp["codec"].append(codec)
            exp["width"].append(w)
            exp["height"].append(h)
        inputs = pa.table({"url": pa.array(urls, pa.string()),
                           "payload": pa.array(payloads, pa.binary())})
        expected = pa.table({
            "url": pa.array(exp["url"], pa.string()),
            "brand": pa.array(exp["brand"], pa.string()),
            "duration_ms": pa.array(exp["duration_ms"], pa.int64()),
            "n_tracks": pa.array(exp["n_tracks"], pa.int64()),
            "codec": pa.array(exp["codec"], pa.string()),
            "width": pa.array(exp["width"], pa.int64()),
            "height": pa.array(exp["height"], pa.int64()),
        })
        return inputs, expected

    extra = f"fps={AVI_FPS},v2"
    _ensure_aux("mp4_inputs.parquet", sf_dir, lambda: tables()[0],
                extra=extra)
    _ensure_aux("mp4_expected.parquet", sf_dir, lambda: tables()[1],
                extra=extra)


def x_mp4_meta(sf_dir: str):
    """ISO-BMFF container schema pass: distributed box parse of mp4
    payloads → (brand, duration, track codec/dims), oracled against
    ground-truth metadata the generator synthesized the files from — the
    dimension/duration/codec filter pass a video corpus runs before any
    (absent here) sample decode."""
    import os as _os

    import ray.data

    _ensure_mp4_aux(sf_dir)
    ds = ray.data.read_parquet(
        _os.path.join(aux_dir_for(sf_dir), "mp4_inputs.parquet"))

    def parse(t: pa.Table) -> pa.Table:
        from ..functions.mp4 import mp4_meta
        rows = {"url": [], "brand": [], "duration_ms": [], "n_tracks": [],
                "codec": [], "width": [], "height": []}
        for url, payload in zip(t["url"].to_pylist(),
                                t["payload"].to_pylist()):
            try:
                m = mp4_meta(payload)
            except ValueError:
                continue
            tr = m["tracks"][0] if m["tracks"] else \
                {"codec": "", "width": 0, "height": 0}
            rows["url"].append(url)
            rows["brand"].append(m["brand"])
            rows["duration_ms"].append(m["duration_ms"])
            rows["n_tracks"].append(m["n_tracks"])
            rows["codec"].append(tr["codec"])
            rows["width"].append(tr["width"])
            rows["height"].append(tr["height"])
        return pa.table({
            "url": pa.array(rows["url"], pa.string()),
            "brand": pa.array(rows["brand"], pa.string()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int64()),
            "n_tracks": pa.array(rows["n_tracks"], pa.int64()),
            "codec": pa.array(rows["codec"], pa.string()),
            "width": pa.array(rows["width"], pa.int64()),
            "height": pa.array(rows["height"], pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


def webm_meta_sql(sf_dir: str) -> str:
    # ground-truth oracle, like x_mp4_meta
    return (f"SELECT url, doctype, duration_ms, n_tracks, codec, width, "
            f"height FROM read_parquet('{aux_dir_for(sf_dir)}"
            f"/webm_expected.parquet')")


def _ensure_webm_aux(sf_dir: str) -> None:
    """EBML skeletons synthesized from each OCR payload's known dims
    (functions/webm.py); expected tabulated directly from the generator."""

    def tables():
        from ..functions.webm import encode_webm_skeleton
        urls, payloads = [], []
        exp = {"url": [], "doctype": [], "duration_ms": [], "n_tracks": [],
               "codec": [], "width": [], "height": []}
        for i, meta in enumerate(_ocr_payload_metas(sf_dir)):
            w, h = meta["width"], meta["height"]
            n_frames = max(h // 64, 1)
            dur = n_frames * 1000 // AVI_FPS
            codec = ["V_VP9", "V_VP8", "V_AV1"][i % 3]
            urls.append(meta["url"])
            payloads.append(encode_webm_skeleton(w, h, dur, codec=codec))
            exp["url"].append(meta["url"])
            exp["doctype"].append("webm")
            exp["duration_ms"].append(dur)
            exp["n_tracks"].append(1)
            exp["codec"].append(codec)
            exp["width"].append(w)
            exp["height"].append(h)
        inputs = pa.table({"url": pa.array(urls, pa.string()),
                           "payload": pa.array(payloads, pa.binary())})
        expected = pa.table({
            "url": pa.array(exp["url"], pa.string()),
            "doctype": pa.array(exp["doctype"], pa.string()),
            "duration_ms": pa.array(exp["duration_ms"], pa.int64()),
            "n_tracks": pa.array(exp["n_tracks"], pa.int64()),
            "codec": pa.array(exp["codec"], pa.string()),
            "width": pa.array(exp["width"], pa.int64()),
            "height": pa.array(exp["height"], pa.int64()),
        })
        return inputs, expected

    extra = f"fps={AVI_FPS},v1"
    _ensure_aux("webm_inputs.parquet", sf_dir, lambda: tables()[0],
                extra=extra)
    _ensure_aux("webm_expected.parquet", sf_dir, lambda: tables()[1],
                extra=extra)


def x_webm_meta(sf_dir: str):
    """EBML/Matroska container schema pass (functions/webm.py): the webm
    twin of x_mp4_meta, ground-truth-oracled. Sample decode (VP8/VP9/AV1)
    stays fail-fast by design."""
    import os as _os

    import ray.data

    _ensure_webm_aux(sf_dir)
    ds = ray.data.read_parquet(
        _os.path.join(aux_dir_for(sf_dir), "webm_inputs.parquet"))

    def parse(t: pa.Table) -> pa.Table:
        from ..functions.webm import webm_meta
        rows = {"url": [], "doctype": [], "duration_ms": [],
                "n_tracks": [], "codec": [], "width": [], "height": []}
        for url, payload in zip(t["url"].to_pylist(),
                                t["payload"].to_pylist()):
            try:
                m = webm_meta(payload)
            except ValueError:
                continue
            tr = m["tracks"][0] if m["tracks"] else \
                {"codec": "", "width": 0, "height": 0}
            rows["url"].append(url)
            rows["doctype"].append(m["doctype"])
            rows["duration_ms"].append(m["duration_ms"])
            rows["n_tracks"].append(m["n_tracks"])
            rows["codec"].append(tr["codec"])
            rows["width"].append(tr["width"])
            rows["height"].append(tr["height"])
        return pa.table({
            "url": pa.array(rows["url"], pa.string()),
            "doctype": pa.array(rows["doctype"], pa.string()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int64()),
            "n_tracks": pa.array(rows["n_tracks"], pa.int64()),
            "codec": pa.array(rows["codec"], pa.string()),
            "width": pa.array(rows["width"], pa.int64()),
            "height": pa.array(rows["height"], pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


# --- URL normalization: the CC-pipeline primitive before domain rollups ---


def url_parse_sql(sf_dir: str) -> str:
    # GROUND-TRUTH oracle: expected fields tabulated from the synthesis
    # PARTS, never from the parser under test.
    return (f"SELECT url, scheme, host, port, registered_domain, "
            f"path_depth, has_query FROM read_parquet("
            f"'{aux_dir_for(sf_dir)}/url_expected.parquet')")


def _ensure_url_aux(sf_dir: str) -> None:
    """Deterministic URL corpus synthesized from parts (subdomains,
    ccTLD second-level registries, ports, IPv4 literals, mixed case,
    query strings); the expected table carries the parts themselves."""

    def tables():
        n_docs = pages_rows_for(sf_dir)
        subs = ["", "www.", "CDN.Media.", "a.b.c."]
        tlds = ["com", "org", "co.uk", "io", "com.au", "de"]
        urls = []
        exp = {"url": [], "scheme": [], "host": [], "port": [],
               "registered_domain": [], "path_depth": [], "has_query": []}
        for i in range(n_docs):
            scheme = "https" if i % 2 else "http"
            if i % 13 == 12:
                host_disp = f"192.168.0.{i % 256}"
                rd = host_disp
            else:
                base = f"site{i % 97}"
                tld = tlds[i % len(tlds)]
                host_disp = f"{subs[i % len(subs)]}{base}.{tld}"
                rd = f"{base}.{tld}"
            port = 8080 if i % 5 == 0 else -1
            depth = i % 4
            path = "".join(f"/p{d}" for d in range(depth))
            query = "?q=1&x=2" if i % 3 == 0 else ""
            url = (f"{scheme}://{host_disp}"
                   + (f":{port}" if port > 0 else "") + path + query)
            urls.append(url)
            exp["url"].append(url)
            exp["scheme"].append(scheme)
            exp["host"].append(host_disp.lower())
            exp["port"].append(port)
            exp["registered_domain"].append(rd.lower())
            exp["path_depth"].append(depth)
            exp["has_query"].append(int(bool(query)))
        inputs = pa.table({"url": pa.array(urls, pa.string())})
        expected = pa.table({
            "url": pa.array(exp["url"], pa.string()),
            "scheme": pa.array(exp["scheme"], pa.string()),
            "host": pa.array(exp["host"], pa.string()),
            "port": pa.array(exp["port"], pa.int64()),
            "registered_domain": pa.array(exp["registered_domain"],
                                          pa.string()),
            "path_depth": pa.array(exp["path_depth"], pa.int64()),
            "has_query": pa.array(exp["has_query"], pa.int64()),
        })
        return inputs, expected

    _ensure_aux("url_inputs.parquet", sf_dir, lambda: tables()[0],
                extra="v1")
    _ensure_aux("url_expected.parquet", sf_dir, lambda: tables()[1],
                extra="v1")


def x_url_parse(sf_dir: str):
    """URL normalization as a distributed stage (functions/urltools.py):
    scheme/host/port/registered-domain/path-depth per url, ground-truth-
    oracled against the parts the corpus was synthesized from. The
    registered-domain column is what CC-style curation buckets by
    (domain dedup, per-domain caps, domain quality priors)."""
    import os as _os

    import ray.data

    _ensure_url_aux(sf_dir)
    ds = ray.data.read_parquet(
        _os.path.join(aux_dir_for(sf_dir), "url_inputs.parquet"))

    def parse(t: pa.Table) -> pa.Table:
        from ..functions.urltools import parse_url
        rows = {"url": [], "scheme": [], "host": [], "port": [],
                "registered_domain": [], "path_depth": [], "has_query": []}
        for url in t["url"].to_pylist():
            try:
                m = parse_url(url)
            except ValueError:
                continue
            rows["url"].append(url)
            for k in ("scheme", "host", "port", "registered_domain",
                      "path_depth", "has_query"):
                rows[k].append(m[k])
        return pa.table({
            "url": pa.array(rows["url"], pa.string()),
            "scheme": pa.array(rows["scheme"], pa.string()),
            "host": pa.array(rows["host"], pa.string()),
            "port": pa.array(rows["port"], pa.int64()),
            "registered_domain": pa.array(rows["registered_domain"],
                                          pa.string()),
            "path_depth": pa.array(rows["path_depth"], pa.int64()),
            "has_query": pa.array(rows["has_query"], pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


def q_domain_rollup(sf_dir: str):
    """Domain-level rollup over the parsed URL corpus: pages + distinct
    hosts per registered domain — the aggregation CC curation runs before
    per-domain caps. One pass: per-batch (domain, host) pre-agg, bounded
    groupby (the synthesized corpus has ≤838 distinct domains at any sf;
    a real web corpus would crc-shard first, the q_union_distinct
    shape)."""
    import os as _os

    import ray.data
    from ray.data.aggregate import Sum

    _ensure_url_aux(sf_dir)
    ds = ray.data.read_parquet(
        _os.path.join(aux_dir_for(sf_dir), "url_inputs.parquet"))

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.urltools import parse_url
        doms, hosts = [], []
        for url in t["url"].to_pylist():
            try:
                m = parse_url(url)
            except ValueError:
                continue
            doms.append(m["registered_domain"])
            hosts.append(m["host"])
        tmp = pa.table({"registered_domain": pa.array(doms, pa.string()),
                        "host": pa.array(hosts, pa.string()),
                        "n": pa.array(np.ones(len(doms), dtype=np.int64))})
        # (domain, host) pre-agg: distinct hosts survive, counts partial
        return tmp.group_by(["registered_domain", "host"]).aggregate(
            [("n", "sum")])

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("host")["n_sum"].sum()
        return pd.DataFrame({
            "registered_domain": [g["registered_domain"].iloc[0]],
            "n_pages": [np.int64(s.sum())],
            "n_hosts": [np.int64(len(s))]})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("registered_domain")
              .map_groups(finish, batch_format="pandas"))


def domain_rollup_sql(sf_dir: str) -> str:
    return (f"""
WITH u AS (SELECT registered_domain, host FROM read_parquet(
  '{aux_dir_for(sf_dir)}/url_expected.parquet'))
SELECT registered_domain, COUNT(*) AS n_pages,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
FROM u GROUP BY registered_domain
""")


DOMAIN_CAP = 3


def q_domain_cap(sf_dir: str, cap: int = DOMAIN_CAP):
    """Per-domain page cap — THE canonical CC curation step: keep at most
    ``cap`` pages per registered domain, deterministically (ordered by
    md5(url), ties impossible on distinct urls).

    Scale shape: domains are high-cardinality on a real web corpus, so
    the groupby runs over 256 crc shards (the CLAUDE.md bounded-groupby
    rule) with the per-domain top-K computed vectorized inside each shard
    — one pass, no global sort; survivors stream out."""
    import hashlib as _hl
    import os as _os
    import zlib as _zlib

    import ray.data

    _ensure_url_aux(sf_dir)
    ds = ray.data.read_parquet(
        _os.path.join(aux_dir_for(sf_dir), "url_inputs.parquet"))

    def tag(t: pa.Table) -> pa.Table:
        from ..functions.urltools import parse_url
        urls, doms, h = [], [], []
        for url in t["url"].to_pylist():
            try:
                m = parse_url(url)
            except ValueError:
                continue
            urls.append(url)
            doms.append(m["registered_domain"])
            h.append(_hl.md5(url.encode()).hexdigest())
        shards = np.array([_zlib.crc32(d.encode()) & 255 for d in doms],
                          dtype=np.int64)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "registered_domain": pa.array(doms, pa.string()),
                         "h": pa.array(h, pa.string()),
                         "_shard": pa.array(shards)})

    def cap_shard(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or "registered_domain" not in g.columns:
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "registered_domain": pd.Series([], dtype=object),
                "rk": pd.Series([], dtype="int64")})
        g = g.sort_values(["registered_domain", "h"], kind="mergesort")
        rk = g.groupby("registered_domain", sort=False).cumcount() + 1
        keep = g[rk <= cap].copy()
        keep["rk"] = rk[rk <= cap].astype("int64")
        return keep[["url", "registered_domain", "rk"]]

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("_shard")
              .map_groups(cap_shard, batch_format="pandas"))


def domain_cap_sql(sf_dir: str) -> str:
    # DuckDB md5() == hashlib md5 hexdigest; ground-truth domain column
    # from the synthesis-parts table
    return (f"""
WITH u AS (SELECT url, registered_domain FROM read_parquet(
  '{aux_dir_for(sf_dir)}/url_expected.parquet')),
r AS (
  SELECT url, registered_domain,
         CAST(ROW_NUMBER() OVER (PARTITION BY registered_domain
                                 ORDER BY md5(url)) AS BIGINT) AS rk
  FROM u)
SELECT url, registered_domain, rk FROM r WHERE rk <= {DOMAIN_CAP}
""")


# --- q_prompt_tokens: M1 (template render) + M11 (placeholder expansion) ---
# The prompt text around the <image> slot is a CONSTANT of the operator, so
# its token count embeds as a literal; the data-dependent part (the tile
# grid from the payload dims, and with it the placeholder count) is derived
# arithmetically by the oracle from the generator's expected payload dims.

_PROMPT_RAW = "<image>\nFree OCR."


def _prompt_constants():
    from ..functions.prompt import num_queries
    from ..functions.templates import render_prompt
    rendered = render_prompt("deepseek", "", _PROMPT_RAW)
    n_text = 1 + sum(len(seg.split()) for seg in rendered.split("<image>"))
    return rendered, n_text, num_queries(640), num_queries(1024)


def _tiling_candidates_sql() -> str:
    from ..functions.imageops import candidate_grids
    return ", ".join(f"({w}, {h})" for w, h in candidate_grids(2, 9))


def _build_prompt_tokens_sql(sf_dir: str) -> str:
    _, n_text, nq_l, nq_g = _prompt_constants()
    n_global = nq_g * (nq_g + 1) + 1
    return rf"""
WITH m AS (
  SELECT url, width, height
  FROM read_parquet('{aux_dir_for(sf_dir)}/payload_meta_expected.parquet')
), cand(w, h) AS (VALUES {_tiling_candidates_sql()}),
diffs AS (
  SELECT m.url, cand.w, cand.h,
         ABS(CAST(m.width AS DOUBLE)/m.height
             - CAST(cand.w AS DOUBLE)/cand.h) AS diff,
         CAST(m.width AS DOUBLE)*m.height
             > 0.5*640*640*cand.w*cand.h AS area_ok
  FROM m, cand
),
mins AS (SELECT url, MIN(diff) AS md FROM diffs GROUP BY url),
-- tie window mirrors best_grid's (and preprocess.rs:107's) f64::EPSILON
-- compare, not exact equality: a diff within eps of the minimum joins the
-- area tie-break on both engines
ties AS (
  SELECT d.* FROM diffs d JOIN mins USING (url)
  WHERE d.diff - mins.md < 2.220446049250313e-16
),
pick AS (
  SELECT url, w, h FROM (
    SELECT url, w, h,
           ROW_NUMBER() OVER (PARTITION BY url
             ORDER BY area_ok DESC,
                      CASE WHEN area_ok THEN -(w*100 + h)
                           ELSE (w*100 + h) END ASC) AS rn
    FROM ties) WHERE rn = 1
),
shape AS (
  SELECT m.url,
         CASE WHEN m.width <= 640 AND m.height <= 640 THEN 1 ELSE p.w END AS wc,
         CASE WHEN m.width <= 640 AND m.height <= 640 THEN 1 ELSE p.h END AS hc
  FROM m JOIN pick p USING (url)
)
SELECT url,
       CAST(wc AS BIGINT) AS width_crops,
       CAST(hc AS BIGINT) AS height_crops,
       CAST(CASE WHEN wc > 1 OR hc > 1
                 THEN ({nq_l}*hc) * ({nq_l}*wc + 1) ELSE 0 END
            + {n_global} AS BIGINT) AS n_image_tokens,
       CAST({n_text} AS BIGINT) AS n_text_tokens,
       CAST(CASE WHEN wc > 1 OR hc > 1
                 THEN ({nq_l}*hc) * ({nq_l}*wc + 1) ELSE 0 END
            + {n_global} + {n_text} AS BIGINT) AS n_tokens
FROM shape
"""


def q_prompt_tokens(sf_dir: str):
    """Template render (M1) + tokenize with placeholder expansion (M11) per
    raster payload; the tile grid comes from the payload dims (T4/D1).
    SQL-oracled: constant text-token count + arithmetic placeholder layout
    over the generator's expected payload dims."""
    import glob

    import ray.data

    from ..config import TilingParams
    from ..functions.dom import extract_dom
    from ..functions.imageops import best_grid
    from ..functions.prompt import Vocab, build_prompt_tokens
    from ..functions.raster import payload_meta
    _ensure_payload_meta_aux(sf_dir)
    rendered, _, _, _ = _prompt_constants()
    params = TilingParams.ocr1()
    d = _pages_dir_for(sf_dir)
    pages = ray.data.read_parquet(sorted(glob.glob(d + "/*.parquet")),
                                  columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        rows = {"url": [], "width_crops": [], "height_crops": [],
                "n_image_tokens": [], "n_text_tokens": [], "n_tokens": []}
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            res = extract_dom(html)
            if res["payload"] is None:
                continue
            meta = payload_meta(res["payload"])
            if meta is None:
                continue
            w, h = meta["width"], meta["height"]
            thr = params.small_image_no_crop_threshold
            if thr is not None and w <= thr and h <= thr:
                crop = (1, 1)
            else:
                crop = best_grid(w, h, params)
            tokens, mask = build_prompt_tokens(
                Vocab(), rendered, [crop], base_size=params.base_size,
                image_size=params.tile_size, crop_mode=True)
            n_img = int(mask.sum())
            rows["url"].append(url)
            rows["width_crops"].append(crop[0])
            rows["height_crops"].append(crop[1])
            rows["n_image_tokens"].append(n_img)
            rows["n_text_tokens"].append(len(tokens) - n_img)
            rows["n_tokens"].append(len(tokens))
        return pa.table({
            "url": pa.array(rows["url"], pa.string()),
            "width_crops": pa.array(rows["width_crops"], pa.int64()),
            "height_crops": pa.array(rows["height_crops"], pa.int64()),
            "n_image_tokens": pa.array(rows["n_image_tokens"], pa.int64()),
            "n_text_tokens": pa.array(rows["n_text_tokens"], pa.int64()),
            "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
        })

    return pages.map_batches(f, batch_format="pyarrow")


# --- x_preprocess_variants: the Paddle/Dots preprocess (M8/M9/M10) as a
# dataset stage. The oracle replicates smart_resize's arithmetic in SQL
# (round-half-away to factor multiples, sqrt-beta area clamp — identical
# IEEE doubles on both engines) over the generator's expected payload dims;
# the pipeline additionally RUNS the real resize/patchify/position kernels
# and asserts their shapes against the same numbers.

PP_PATCH = 14
PP_MERGE = 2
PP_FACTOR = PP_PATCH * PP_MERGE          # 28
PP_MIN_PIXELS = PP_FACTOR * PP_FACTOR * 4       # 3136
PP_MAX_PIXELS = PP_FACTOR * PP_FACTOR * 1280    # ~1M


def _smart_resize_sql(sf_dir: str) -> str:
    f = PP_FACTOR
    return rf"""
WITH m AS (
  SELECT url, CAST(height AS DOUBLE) AS h0, CAST(width AS DOUBLE) AS w0
  FROM read_parquet('{aux_dir_for(sf_dir)}/payload_meta_expected.parquet')
), s1 AS (  -- if h < factor: w = round(w*f/h); h = f
  SELECT url,
         CASE WHEN h0 < {f} THEN FLOOR(w0 * {f} / h0 + 0.5) ELSE w0 END AS w1,
         CASE WHEN h0 < {f} THEN {f} ELSE h0 END AS h1
  FROM m
), s2 AS (  -- if w < factor: h = round(h*f/w); w = f
  SELECT url,
         CASE WHEN w1 < {f} THEN FLOOR(h1 * {f} / w1 + 0.5) ELSE h1 END AS h,
         CASE WHEN w1 < {f} THEN {f} ELSE w1 END AS w
  FROM s1
), s3 AS (
  SELECT url, h, w,
         FLOOR(h / {f} + 0.5) * {f} AS hb0,
         FLOOR(w / {f} + 0.5) * {f} AS wb0
  FROM s2
), s4 AS (
  SELECT url, h, w,
         CASE WHEN hb0 * wb0 > {PP_MAX_PIXELS}
              THEN FLOOR((h / SQRT(h * w / {PP_MAX_PIXELS})) / {f}) * {f}
              WHEN hb0 * wb0 < {PP_MIN_PIXELS}
              THEN CEIL((h * SQRT({PP_MIN_PIXELS} / (h * w))) / {f}) * {f}
              ELSE hb0 END AS h_bar,
         CASE WHEN hb0 * wb0 > {PP_MAX_PIXELS}
              THEN FLOOR((w / SQRT(h * w / {PP_MAX_PIXELS})) / {f}) * {f}
              WHEN hb0 * wb0 < {PP_MIN_PIXELS}
              THEN CEIL((w * SQRT({PP_MIN_PIXELS} / (h * w))) / {f}) * {f}
              ELSE wb0 END AS w_bar
  FROM s3
)
SELECT url, CAST(h_bar AS BIGINT) AS h_bar, CAST(w_bar AS BIGINT) AS w_bar,
       CAST(h_bar / {PP_PATCH} AS BIGINT) AS grid_h,
       CAST(w_bar / {PP_PATCH} AS BIGINT) AS grid_w,
       CAST((h_bar / {PP_PATCH}) * (w_bar / {PP_PATCH}) AS BIGINT) AS n_patches,
       CAST((h_bar / {PP_FACTOR}) * (w_bar / {PP_FACTOR}) AS BIGINT) AS n_merged_blocks
FROM s4
"""


def x_preprocess_variants(sf_dir: str):
    """Multi-model preprocess variants (M8 smart_resize, M9 patchify in
    both Paddle row-major and Dots merge-block layouts, M10 position ids)
    run as a per-record dataset stage over the raster payloads
    (crates/infer-paddleocr/src/vision/preprocess.rs:178-300)."""
    import glob

    import ray.data

    from ..functions.imageops import (normalize_chw, patchify_merge_blocks,
                                      patchify_row_major, position_metadata,
                                      resize_bicubic, smart_resize)
    _ensure_payload_meta_aux(sf_dir)
    d = _pages_dir_for(sf_dir)
    pages = ray.data.read_parquet(sorted(glob.glob(d + "/*.parquet")),
                                  columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        from ..functions.dom import extract_dom
        from ..functions.raster import decode_payload
        rows = {"url": [], "h_bar": [], "w_bar": [], "grid_h": [],
                "grid_w": [], "n_patches": [], "n_merged_blocks": []}
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            res = extract_dom(html)
            if res["payload"] is None:
                continue
            try:
                img, _scale, _margin = decode_payload(res["payload"])
            except ValueError:
                continue
            h, w = img.shape[:2]
            h_bar, w_bar = smart_resize(h, w, PP_FACTOR,
                                        PP_MIN_PIXELS, PP_MAX_PIXELS)
            resized = resize_bicubic(img, w_bar, h_bar)
            chw = normalize_chw(resized)
            hwc = np.ascontiguousarray(chw.transpose(1, 2, 0))
            p_row = patchify_row_major(hwc, PP_PATCH)
            p_blk = patchify_merge_blocks(hwc, PP_PATCH, PP_MERGE)
            gh, gw = h_bar // PP_PATCH, w_bar // PP_PATCH
            pos, rr, cc = position_metadata((1, gh, gw))
            assert p_row.shape == p_blk.shape == (gh * gw, 3 * PP_PATCH ** 2)
            assert pos.shape[0] == gh * gw
            rows["url"].append(url)
            rows["h_bar"].append(h_bar)
            rows["w_bar"].append(w_bar)
            rows["grid_h"].append(gh)
            rows["grid_w"].append(gw)
            rows["n_patches"].append(gh * gw)
            rows["n_merged_blocks"].append((gh // PP_MERGE) * (gw // PP_MERGE))
        return pa.table({k: pa.array(v, pa.string() if k == "url"
                                     else pa.int64())
                         for k, v in rows.items()})

    return pages.map_batches(f, batch_format="pyarrow")


def extract_manifest_sql(sf_dir: str) -> str:
    return (f"SELECT partition_id, size_class, row_count, ocr_rows, "
            f"content_hash, status "
            f"FROM read_parquet('{aux_dir_for(sf_dir)}/manifest_expected.parquet')")


def _expected_manifest_table(sf_dir: str) -> pa.Table:
    """Driver-side single-process derivation of the lineage manifest: the
    oracle extractor (plain Python loop, no Ray) produces per-row text and
    method; wave/size-class assignment and the XOR content hash follow the
    documented manifest spec. The distributed job must reproduce this
    exactly at any parallelism."""
    import glob

    import pyarrow.parquet as pq

    from ..stages.dom import size_class_of
    from .extract import _row_hash_xor

    d = _pages_dir_for(sf_dir)
    files = sorted(glob.glob(d + "/*.parquet"))
    wave_size = 8
    file_rows = [pq.ParquetFile(f).metadata.num_rows for f in files]
    wave_of_row = np.repeat(
        [fi // wave_size for fi in range(len(files))], file_rows)

    pages, golden, cuts = _oracle_golden(sf_dir)
    sc = [size_class_of(len(h), cuts)
          for h in pages.column("html").to_pylist()]
    agg: dict = {}
    for w, s, u, txt, m in zip(wave_of_row, sc,
                               golden.column("url").to_pylist(),
                               golden.column("extracted_text").to_pylist(),
                               golden.column("method").to_pylist()):
        a = agg.setdefault((int(w), int(s)), {"rc": 0, "ocr": 0, "h": 0})
        a["rc"] += 1
        a["ocr"] += int(m == "ocr")
        a["h"] ^= _row_hash_xor([u], [txt])
    keys = sorted(agg)
    return pa.table({
        "partition_id": pa.array([k[0] for k in keys], pa.int32()),
        "size_class": pa.array([k[1] for k in keys], pa.int32()),
        "row_count": pa.array([agg[k]["rc"] for k in keys], pa.int64()),
        "ocr_rows": pa.array([agg[k]["ocr"] for k in keys], pa.int64()),
        "content_hash": pa.array([f"{agg[k]['h'] & ((1 << 128) - 1):032x}"
                                  for k in keys], pa.string()),
        "status": pa.array(["committed"] * len(keys), pa.string()),
    })


def x_extract_manifest(sf_dir: str):
    """Run the resumable job (cached across calls via committed waves) and
    return its lineage manifest — exercises commit/resume as an operator.
    SQL-oracled against the single-process expected manifest (AUX_DIR)."""
    import glob
    from ..state import manifest as mfst
    from .extract import run_extract_job
    d = _pages_dir_for(sf_dir)
    out = d.rstrip("/") + "_out"
    run_extract_job(sorted(glob.glob(d + "/*.parquet")), out, wave_size=8)
    _ensure_aux("manifest_expected.parquet", sf_dir,
                lambda: _expected_manifest_table(sf_dir))
    t = mfst.read_manifest(out)
    return t.select(["partition_id", "size_class", "row_count", "ocr_rows",
                     "content_hash", "status"])


def corpus_pipeline_sql(sf_dir: str) -> str:
    return (f"SELECT unique_docs, total_tokens, ocr_docs, docs_after_gate "
            f"FROM read_parquet('{aux_dir_for(sf_dir)}/corpus_summary_expected.parquet')")


def _write_expected_corpus_summary(sf_dir: str) -> None:
    """Single-process derivation of the composed pipeline's summary row:
    oracle extractor → same gate predicate → dict-based dedup → rollup.
    Stamp-skipped (the oracle extractor is the cost)."""

    def build() -> pa.Table:
        _, golden, _ = _oracle_golden(sf_dir)
        agg: dict = {}
        for text, method in zip(golden.column("extracted_text").to_pylist(),
                                golden.column("method").to_pylist()):
            toks = T.ascii_tokens(text)
            if len(toks) < 5 or sum(len(x) for x in toks) / len(toks) >= 20.0:
                continue
            key = T.md5_hex(text)
            a = agg.setdefault(key, {"tokens": len(toks),
                                     "is_ocr": 1 if method == "ocr" else 0,
                                     "n": 0})
            a["tokens"] = min(a["tokens"], len(toks))
            a["is_ocr"] = min(a["is_ocr"], 1 if method == "ocr" else 0)
            a["n"] += 1
        return pa.table({
            "unique_docs": pa.array([len(agg)], pa.int64()),
            "total_tokens": pa.array([sum(a["tokens"] for a in agg.values())],
                                     pa.int64()),
            "ocr_docs": pa.array([sum(a["is_ocr"] for a in agg.values())],
                                 pa.int64()),
            "docs_after_gate": pa.array([sum(a["n"] for a in agg.values())],
                                        pa.int64()),
        })

    _ensure_aux("corpus_summary_expected.parquet", sf_dir, build)


def x_corpus_pipeline(sf_dir: str):
    """The composed training-data pipeline: extraction → quality filter →
    exact dedup → corpus stats. One streaming pass plus one hash-groupby
    (the dedup); returns a single summary row. SQL-oracled against the
    single-process derivation (oracle extractor + dict dedup).

        pages → DOM/OCR extraction (flagship)
              → quality gate (ASCII token count ≥ 5, mean token len < 20)
              → dedup by extracted-text md5 (keep min url)
              → corpus rollup (docs, tokens, ocr share)
    """
    import glob
    from ray.data.aggregate import Count, Sum
    from .extract import build_extract_dataset
    d = _pages_dir_for(sf_dir)
    _write_expected_corpus_summary(sf_dir)
    ds = build_extract_dataset(sorted(glob.glob(d + "/*.parquet")))

    def gate_and_hash(t: pa.Table) -> pa.Table:
        texts = t.column("extracted_text").to_pylist()
        methods = t.column("method").to_pylist()
        urls = t.column("url").to_pylist()
        rows = {"url": [], "text_md5": [], "tokens": [], "is_ocr": []}
        for url, text, method in zip(urls, texts, methods):
            toks = T.ascii_tokens(text)
            if len(toks) < 5:
                continue
            if sum(len(x) for x in toks) / len(toks) >= 20.0:
                continue
            rows["url"].append(url)
            rows["text_md5"].append(T.md5_hex(text))
            rows["tokens"].append(len(toks))
            rows["is_ocr"].append(1 if method == "ocr" else 0)
        return pa.table({"url": pa.array(rows["url"], pa.string()),
                         "text_md5": pa.array(rows["text_md5"], pa.string()),
                         "shard": pa.array([int(h[:2], 16)
                                            for h in rows["text_md5"]],
                                           pa.int64()),
                         "tokens": pa.array(rows["tokens"], pa.int64()),
                         "is_ocr": pa.array(rows["is_ocr"], pa.int64())})

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("text_md5")
                .agg(keep_url=("url", "min"), tokens=("tokens", "min"),
                     is_ocr=("is_ocr", "min"), n_copies=("url", "size"))
                .reset_index())
        out["n_copies"] = out["n_copies"].astype("int64")
        return out[["text_md5", "keep_url", "tokens", "is_ocr", "n_copies"]]

    gated = ds.map_batches(gate_and_hash, batch_format="pyarrow")
    # sharded dedup groupby — same pattern (and rationale) as q_dedup_exact
    deduped = gated.groupby("shard").map_groups(dedup_group,
                                                batch_format="pandas")
    df = (deduped.groupby(None)
                 .aggregate(Count(alias_name="unique_docs"),
                            Sum("tokens", alias_name="total_tokens"),
                            Sum("is_ocr", alias_name="ocr_docs"),
                            Sum("n_copies", alias_name="docs_after_gate"))
                 .to_pandas())
    return df


def extract_stage_totals_sql(sf_dir: str) -> str:
    aux = aux_dir_for(sf_dir)
    return (f"SELECT stage, count FROM ("
            f"SELECT 'dom' AS stage, COUNT(*) AS count "
            f"FROM read_parquet('{aux}/extract_expected.parquet') "
            f"UNION ALL SELECT 'ocr', COUNT(*) "
            f"FROM read_parquet('{aux}/extract_expected.parquet') "
            f"WHERE method = 'ocr') ORDER BY stage")


def x_extract_stage_totals(sf_dir: str):
    """G1 stage-totals rollup over the job's per-wave metrics
    (crates/cli/src/bench.rs:139-172). The query surface is the ORACLED
    half — per-stage row counts, deterministic per fixture (dom sees every
    page, ocr only the routed rows) and checked against the single-process
    golden rows. The timing half (total/min/max ms per stage) is inherently
    wall-clock and stays rows-only: it lives in the job's ``_metrics``
    parquet and ``report.json`` (see ``read_stage_totals`` /
    ``_write_job_report``) rather than under the value-hash gate."""
    import glob
    from .extract import read_stage_totals, run_extract_job
    d = _pages_dir_for(sf_dir)
    out = d.rstrip("/") + "_out"
    run_extract_job(sorted(glob.glob(d + "/*.parquet")), out, wave_size=8)
    _write_expected_extract(sf_dir)
    return read_stage_totals(out).select_columns(["stage", "count"])


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (cluster, then drop near-dups in-cluster)
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.4
SEMDEDUP_TARGET_CLUSTER_ROWS = 100   # k ≈ n / this (clipped below)
SEMDEDUP_MAX_K = 2048                # ≤ the driver k-means sample size


def semdedup_k(sf_dir: str) -> int:
    """Cluster count for q_semdedup, scaled with the corpus: k ≈
    n / SEMDEDUP_TARGET_CLUSTER_ROWS so the per-cluster O((n/k)²) cosine
    block stays ~constant as n grows (the SemDeDup paper's regime — k
    grows with the corpus, e.g. 110k clusters for LAION). Clipped to
    [IVF_CLUSTERS, SEMDEDUP_MAX_K]; the upper clip is the driver-side
    k-means sample size (a 100-TB deployment would raise the sample and
    cap together, or go hierarchical). Read from parquet metadata — no
    data pass."""
    import os

    import pyarrow.parquet as pq
    n = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    return max(IVF_CLUSTERS,
               min(n // SEMDEDUP_TARGET_CLUSTER_ROWS, SEMDEDUP_MAX_K))


def _semdedup_cent_name(k: int) -> str:
    return f"semdedup_centroids_k{k}.parquet"


def q_semdedup(sf_dir: str):
    """Semantic dedup à la SemDeDup (Abbas et al. 2023): k-means-cluster the
    embedding space, then inside each cluster drop every vector that has a
    LOWER-vec_id neighbor with round6-cosine >= SEMDEDUP_TAU.

    The keep rule is the one-shot lower-id form (drop iff ∃ lower-id
    neighbor over the bar) rather than SemDeDup's sequential greedy scan —
    it is order-free, SQL-expressible as an EXISTS self-join, and keeps the
    lowest-id member of every near-dup neighborhood just the same.

    Scale shape: centroid training is the driver-side seeded k-means the
    IVF index uses (_ivf_centroids, broadcast once) at k = semdedup_k(n)
    — the cluster count SCALES WITH THE CORPUS so per-cluster O((n/k)²)
    work stays bounded; assignment is a pure map (argmax of
    round6-truncated raw-embedding · centroid dots — truncation on BOTH
    engines so an accumulation-order ulp can never flip the argmax vs the
    oracle's ROW_NUMBER); the only shuffle groups by cluster. The
    centroid side-table is published under a k-keyed filename so the SQL
    oracle provably reads the same model at every scale.
    """
    import ray

    k = semdedup_k(sf_dir)
    cent = _ivf_centroids(sf_dir, k=k)
    _write_centroids_aux(cent, sf_dir, _semdedup_cent_name(k))
    state = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(state)
        embs = np.array(t["embedding"].to_pylist(),
                        dtype=np.float32).astype(np.float64)
        d6 = np.floor(embs @ c.T * 1e6 + 0.5) / 1e6
        cl = np.argmax(d6, axis=1).astype(np.int64)   # ties → lowest c
        return pa.table({"vec_id": t["vec_id"], "embedding": t["embedding"],
                         "cluster": pa.array(cl)})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        E = np.array(g["embedding"].tolist(),
                     dtype=np.float32).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", E, E))
        # dot/(|a|·|b|) in the oracle's op order (q_embed_dup_pairs note)
        C6 = np.floor((E @ E.T) / np.outer(norms, norms) * 1e6 + 0.5) / 1e6
        n = len(ids)
        dup_of = np.full(n, -1, dtype=np.int64)
        for i in range(1, n):
            js = np.nonzero(C6[i, :i] >= SEMDEDUP_TAU)[0]
            if js.size:
                dup_of[i] = ids[js[0]]          # ids sorted → min lower id
        return pd.DataFrame({
            "vec_id": pd.Series(ids, dtype="int64"),
            "cluster": pd.Series(g["cluster"].to_numpy(), dtype="int64"),
            "keep": pd.Series((dup_of == -1).astype(np.int64)),
            "dup_of": pd.Series(dup_of, dtype="int64")})

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("cluster")
              .map_groups(dedup, batch_format="pandas"))


def semdedup_sql(sf_dir: str) -> str:
    cent_file = _semdedup_cent_name(semdedup_k(sf_dir))
    return f"""
WITH cent AS (SELECT c, i, w FROM read_parquet('{aux_dir_for(sf_dir)}/{cent_file}')),
adots AS (
  SELECT e.vec_id, cent.c,
         FLOOR(SUM(CAST(e.embedding[cent.i] AS DOUBLE) * cent.w) * 1000000 + 0.5)/1000000 AS d
  FROM embeddings e, cent
  GROUP BY e.vec_id, cent.c
),
assign AS (
  SELECT vec_id, c AS cluster FROM (
    SELECT vec_id, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, c ASC) AS rn
    FROM adots) WHERE rn = 1
),
pairs AS (
  SELECT a1.vec_id AS a, a2.vec_id AS b,
         CAST(ea.embedding[i] AS DOUBLE) AS x,
         CAST(eb.embedding[i] AS DOUBLE) AS y
  FROM assign a1
  JOIN assign a2 ON a1.cluster = a2.cluster AND a2.vec_id < a1.vec_id
  JOIN embeddings ea ON ea.vec_id = a1.vec_id
  JOIN embeddings eb ON eb.vec_id = a2.vec_id,
       generate_series(1, 64) AS t(i)
),
cos AS (
  SELECT a, b,
         FLOOR(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) * 1000000 + 0.5)/1000000 AS cos
  FROM pairs GROUP BY a, b
),
dups AS (
  SELECT a AS vec_id, MIN(b) AS dup_of FROM cos
  WHERE cos >= {SEMDEDUP_TAU}e0 GROUP BY a
)
SELECT s.vec_id, CAST(s.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(COALESCE(d.dup_of, -1) AS BIGINT) AS dup_of
FROM assign s LEFT JOIN dups d ON s.vec_id = d.vec_id
"""


# ---------------------------------------------------------------------------
# co-occurrence statistics (PMI) and inverted-index construction
# ---------------------------------------------------------------------------

PMI_MIN_PAIR_DOCS = 5


def q_pmi_pairs(sf_dir: str):
    """Pointwise mutual information of token pairs co-occurring in a doc:
    pmi(a,b) = log2(N·c_ab / (c_a·c_b)) over document-level presence counts,
    for pairs seen in >= PMI_MIN_PAIR_DOCS documents.

    Scale shape: per-batch Counters pre-aggregate pair/token presence, so
    the shuffle carries one row per (batch, pair) — pair cardinality is
    vocabulary-bounded (~30² here; an open-vocab corpus would shard pairs
    by hash exactly like q_top_tokens shards tokens). N, c_a, c_b, c_ab
    are exact int64; the single log2(double·double/(double·double))
    expression is written identically in both engines and round6-truncated.
    """
    import math

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        pair_c: Counter = Counter()
        tok_c: Counter = Counter()
        ndocs = 0
        for s in t.column("text").to_pylist():
            toks = sorted(set(T.ascii_tokens(s)))
            ndocs += 1
            tok_c.update(toks)
            for i in range(len(toks)):
                for j in range(i + 1, len(toks)):
                    pair_c[(toks[i], toks[j])] += 1
        rows = {"a": [], "b": [], "n": []}
        for (a, b), n in pair_c.items():
            rows["a"].append(a)
            rows["b"].append(b)
            rows["n"].append(n)
        # token presence + the batch doc count ride along as sentinel rows
        # (b = '' cannot be a token: tokens are non-empty by construction)
        for a, n in tok_c.items():
            rows["a"].append(a)
            rows["b"].append("")
            rows["n"].append(n)
        rows["a"].append("")
        rows["b"].append("")
        rows["n"].append(ndocs)
        return pa.table({"a": pa.array(rows["a"], pa.string()),
                         "b": pa.array(rows["b"], pa.string()),
                         "n": pa.array(np.array(rows["n"], dtype=np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["a", "b"])
             .aggregate(Sum("n", alias_name="n"))).to_pandas()
    n_docs = int(agg.loc[(agg["a"] == "") & (agg["b"] == ""), "n"].iloc[0])
    toks = agg[(agg["b"] == "") & (agg["a"] != "")]
    c_tok = dict(zip(toks["a"], toks["n"]))
    pairs = agg[(agg["a"] != "") & (agg["b"] != "")]
    pairs = pairs[pairs["n"] >= PMI_MIN_PAIR_DOCS]
    pmi = [np.floor(math.log2(float(n_docs) * float(nab)
                              / (float(c_tok[a]) * float(c_tok[b])))
                    * 1e6 + 0.5) / 1e6
           for a, b, nab in zip(pairs["a"], pairs["b"], pairs["n"])]
    return pd.DataFrame({"a": pairs["a"].to_numpy(),
                         "b": pairs["b"].to_numpy(),
                         "n_ab": pairs["n"].astype("int64").to_numpy(),
                         "pmi": np.array(pmi, dtype=np.float64)})


# plain ascii_tokens mirror (no lowercasing — unlike _SQL_LOWER_TOKS);
# composed from the canonical spelling in common.sql_tok_array
from .common import sql_tok_array as _sql_tok_array

_SQL_TOK_ARRAY = _sql_tok_array("text")

_PMI_TOKS = rf"""
dtoks AS (
  SELECT DISTINCT doc_id, unnest({_SQL_TOK_ARRAY}) AS t FROM documents
)"""

Q_PMI_SQL = rf"""
WITH {_PMI_TOKS},
n AS (SELECT COUNT(*) AS n_docs FROM documents),
ca AS (SELECT t, COUNT(*) AS c FROM dtoks GROUP BY t),
cab AS (
  SELECT x.t AS a, y.t AS b, COUNT(*) AS n_ab
  FROM dtoks x JOIN dtoks y ON x.doc_id = y.doc_id AND x.t < y.t
  GROUP BY x.t, y.t
)
SELECT cab.a, cab.b, CAST(cab.n_ab AS BIGINT) AS n_ab,
       FLOOR(log2(CAST(n.n_docs AS DOUBLE) * CAST(cab.n_ab AS DOUBLE)
                  / (CAST(xa.c AS DOUBLE) * CAST(xb.c AS DOUBLE)))
             * 1000000 + 0.5) / 1000000 AS pmi
FROM cab, n
JOIN ca xa ON xa.t = cab.a
JOIN ca xb ON xb.t = cab.b
WHERE cab.n_ab >= {PMI_MIN_PAIR_DOCS}
"""


INVIDX_POSTINGS_CAP = 10


def q_inverted_index(sf_dir: str):
    """Inverted-index build: token → document frequency + the first
    INVIDX_POSTINGS_CAP doc_ids ascending as a comma-joined postings
    preview (a string so the driver hash gate compares it exactly;
    production postings would stay a list<int64> column).

    Scale shape: per-batch (token, doc_id) presence pairs with local
    dedup, grouped by token — vocabulary-bounded here; an open vocab
    shards tokens by hash first (q_top_tokens pattern). Per-group work is
    a sort of that token's postings, capped output.
    """
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks_out, docs_out = [], []
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for tok in set(T.ascii_tokens(s)):
                toks_out.append(tok)
                docs_out.append(d)
        return pa.table({"token": pa.array(toks_out, pa.string()),
                         "doc_id": pa.array(np.array(docs_out,
                                                     dtype=np.int64))})

    def build(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        return pd.DataFrame({
            "token": [g["token"].iloc[0]],
            "n_docs": [np.int64(len(ids))],
            "postings": [",".join(str(i)
                                  for i in ids[:INVIDX_POSTINGS_CAP])]})

    return (ds.map_batches(explode, batch_format="pyarrow")
              .groupby("token")
              .map_groups(build, batch_format="pandas"))


Q_INVIDX_SQL = rf"""
WITH {_PMI_TOKS},
r AS (
  SELECT t AS token, doc_id,
         ROW_NUMBER() OVER (PARTITION BY t ORDER BY doc_id) AS rn
  FROM dtoks
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_docs,
       string_agg(CASE WHEN rn <= {INVIDX_POSTINGS_CAP}
                       THEN CAST(doc_id AS VARCHAR) END, ','
                  ORDER BY doc_id) AS postings
FROM r GROUP BY token
"""
