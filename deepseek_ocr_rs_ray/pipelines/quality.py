"""Gopher-style repetition / lexical-diversity quality signals.

Web-scale training corpora are filtered on *repetition* statistics before
anything model-based runs (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Table A1): documents
dominated by one repeated n-gram, or with a large fraction of characters
inside duplicated long n-grams, are boilerplate/spam with high probability.
This module implements the two workhorse signals over the ``documents``
table plus a unigram lexical-diversity probe (type-token ratio + Shannon
entropy), each as a single embarrassingly-parallel ``map_batches`` pass —
the 100-TB shape is "pure map, no shuffle", identical to the reference's
per-record scalar stages (SURVEY.md §2.8).

Determinism spec (cross-engine, hash-exact under the dtype-strict gate):

- tokens are ``textops.ascii_tokens`` (explicit ASCII-whitespace set on
  both engines — pipelines/common.py);
- an n-gram's char length is ``len(' '.join(gram))`` = sum of token
  lengths + (n-1); counts and char totals are exact int64;
- ``top2_chars`` = MAX over distinct 2-grams of ``count * len`` — a pure
  MAX of integer products, so no argmax tie-break is needed (Gopher's
  "chars in the most frequent 2-gram" needs one; this variant is the
  deterministic upper-bound form and is documented as such);
- ``dup3_chars`` = SUM over distinct 3-grams occurring more than once of
  ``count * len`` (all occurrences counted — the Gopher "fraction of
  characters inside duplicated n-grams" numerator; Gopher uses n=5..10,
  but the synthetic corpus's ~30-word vocabulary makes repeats of n>=4
  vanishingly rare — 0/500 docs at sf0.01 — so n=3 is the smallest n
  that exercises both branches; threshold 0.15 = Gopher's dup-5 value);
- fractions are one ``double(int)/double(int)`` division; the keep flag
  compares those doubles against DOUBLE literals (thresholds 0.2 / 0.15),
  identical IEEE ops on both engines;
- entropy uses ``log2`` from the platform libm on BOTH engines (CPython
  ``math.log2`` and DuckDB ``log2`` resolve to the same glibc on this
  host) and is truncated with the round6 rule; the ~30-term sum's
  accumulation-order ulps sit far from the 1e-6 truncation boundary
  (same argument as the cosine oracles, pipelines/common.py).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ..functions import textops as T
from .common import (SQL_ASCII_TRIM, SQL_ASCII_WS_PATTERN,
                     read_table, sql_tok_array)

GOPHER_TOP2_MAX = 0.2  # Gopher Table A1: top-2-gram char fraction
GOPHER_DUP3_MAX = 0.15  # Gopher dup-5-gram threshold, applied at n=3 (see above)


def gopher_repetition_row(s: str) -> tuple:
    """(n_chars, top2_chars, dup3_chars) for one document (exact ints)."""
    toks = T.ascii_tokens(s)
    lens = [len(t) for t in toks]
    top2 = 0
    if len(toks) >= 2:
        c2 = Counter(zip(toks, toks[1:]))
        top2 = max(cnt * (len(a) + len(b) + 1) for (a, b), cnt in c2.items())
    dup3 = 0
    if len(toks) >= 3:
        c3 = Counter(tuple(toks[i:i + 3]) for i in range(len(toks) - 2))
        glen = {}
        for i in range(len(toks) - 2):
            g = tuple(toks[i:i + 3])
            if g not in glen:
                glen[g] = lens[i] + lens[i + 1] + lens[i + 2] + 2
        dup3 = sum(cnt * glen[g] for g, cnt in c3.items() if cnt > 1)
    return len(s), top2, dup3


def gopher_batch_stats(texts) -> dict:
    """Batch-level Gopher arrays shared by q_gopher_repetition and
    x_curation_pipeline (ONE spelling of the keep predicate). Empty texts
    get fractions of exactly 0.0 (keep=1) — mirrored in the SQL with a
    CASE on n_chars=0, where DuckDB's 0/0 would otherwise yield NULL and
    break the dtype-strict gate."""
    rows = [gopher_repetition_row(s) for s in texts]
    n_chars = np.array([r[0] for r in rows], dtype=np.int64)
    top2 = np.array([r[1] for r in rows], dtype=np.int64)
    dup3 = np.array([r[2] for r in rows], dtype=np.int64)
    denom = np.where(n_chars > 0, n_chars, 1).astype(np.float64)
    top2_frac = top2.astype(np.float64) / denom
    dup3_frac = dup3.astype(np.float64) / denom
    keep = (~((top2_frac > GOPHER_TOP2_MAX)
              | (dup3_frac > GOPHER_DUP3_MAX))).astype(np.int64)
    return {"n_chars": n_chars, "top2_chars": top2, "dup3_chars": dup3,
            "top2_frac": top2_frac, "dup3_frac": dup3_frac, "keep": keep}


def q_gopher_repetition(sf_dir: str):
    """Per-doc Gopher repetition signals + keep flag (pure map, no shuffle).

    Per-row Python over the token list is inherent to n-gram multiset
    construction (same trade as the shingle kernels, corpus.py); everything
    batch-level stays Arrow.
    """
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        g = gopher_batch_stats(t.column("text").to_pylist())
        return pa.table({"doc_id": t["doc_id"],
                         **{k: pa.array(v) for k, v in g.items()}})

    return ds.map_batches(f, batch_format="pyarrow")


_TRIM = SQL_ASCII_TRIM.format(col="text")

_SQL_TOKS_IDX = rf"""
toks AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         {sql_tok_array("text")} AS tok
  FROM documents
),
idx AS (
  SELECT doc_id, unnest(tok) AS t, unnest(range(1, len(tok)+1)) AS i
  FROM toks
)"""

_G3 = " || ' ' || ".join(["t"] + [f"lead(t, {k}) OVER w" for k in range(1, 3)])

Q_GOPHER_SQL = rf"""
WITH {_SQL_TOKS_IDX},
g2 AS (
  SELECT doc_id, t || ' ' || lead(t, 1) OVER w AS g
  FROM idx WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(t, 1) OVER w IS NOT NULL
),
a2 AS (
  SELECT doc_id, MAX(c * glen) AS top2_chars FROM (
    SELECT doc_id, g, CAST(length(g) AS BIGINT) AS glen, COUNT(*) AS c
    FROM g2 GROUP BY doc_id, g
  ) GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, {_G3} AS g
  FROM idx WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(t, 2) OVER w IS NOT NULL
),
a3 AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN c > 1 THEN c * glen ELSE 0 END) AS BIGINT)
           AS dup3_chars
  FROM (
    SELECT doc_id, g, CAST(length(g) AS BIGINT) AS glen, COUNT(*) AS c
    FROM g3 GROUP BY doc_id, g
  ) GROUP BY doc_id
),
j AS (
  SELECT toks.doc_id, toks.n_chars,
         COALESCE(a2.top2_chars, 0) AS top2_chars,
         COALESCE(a3.dup3_chars, 0) AS dup3_chars,
         CASE WHEN toks.n_chars = 0 THEN 0.0e0
              ELSE CAST(COALESCE(a2.top2_chars, 0) AS DOUBLE)
                   / CAST(toks.n_chars AS DOUBLE) END AS top2_frac,
         CASE WHEN toks.n_chars = 0 THEN 0.0e0
              ELSE CAST(COALESCE(a3.dup3_chars, 0) AS DOUBLE)
                   / CAST(toks.n_chars AS DOUBLE) END AS dup3_frac
  FROM toks
  LEFT JOIN a2 ON toks.doc_id = a2.doc_id
  LEFT JOIN a3 ON toks.doc_id = a3.doc_id
)
SELECT doc_id, n_chars, top2_chars, dup3_chars, top2_frac, dup3_frac,
       CAST(NOT (top2_frac > 0.2e0 OR dup3_frac > 0.15e0) AS BIGINT) AS keep
FROM j
"""


def token_entropy_row(s: str) -> tuple:
    """(n_tokens, n_distinct, entropy_sum) — entropy_sum = Σ c·log2(c)."""
    import math
    toks = T.ascii_tokens(s)
    c = Counter(toks)
    ent_sum = sum(cnt * math.log2(cnt) for cnt in c.values())
    return len(toks), len(c), ent_sum


def q_token_entropy(sf_dir: str):
    """Per-doc lexical diversity: type-token ratio + unigram Shannon entropy
    (round6-truncated; H = log2(n) − Σ c·log2(c) / n). Pure map."""
    import math
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        rows = [token_entropy_row(s) for s in texts]
        n = np.array([r[0] for r in rows], dtype=np.int64)
        d = np.array([r[1] for r in rows], dtype=np.int64)
        ent = np.zeros(len(rows), dtype=np.float64)
        ttr = np.zeros(len(rows), dtype=np.float64)
        for k, (nt, nd, s_) in enumerate(rows):
            if nt > 0:
                ttr[k] = float(nd) / float(nt)
                h = math.log2(float(nt)) - s_ / float(nt)
                ent[k] = np.floor(h * 1e6 + 0.5) / 1e6
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n),
            "n_distinct": pa.array(d),
            "ttr": pa.array(ttr),
            "entropy": pa.array(ent),
        })

    return ds.map_batches(f, batch_format="pyarrow")


Q_TOKEN_ENTROPY_SQL = rf"""
WITH {_SQL_TOKS_IDX},
c AS (SELECT doc_id, t, COUNT(*) AS c FROM idx GROUP BY doc_id, t),
a AS (
  SELECT doc_id, SUM(c) AS n, COUNT(*) AS d,
         SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS s
  FROM c GROUP BY doc_id
)
SELECT toks.doc_id,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.d, 0) AS BIGINT) AS n_distinct,
       CASE WHEN COALESCE(a.n, 0) > 0
            THEN CAST(a.d AS DOUBLE) / CAST(a.n AS DOUBLE)
            ELSE 0.0e0 END AS ttr,
       CASE WHEN COALESCE(a.n, 0) > 0
            THEN FLOOR((log2(CAST(a.n AS DOUBLE))
                        - a.s / CAST(a.n AS DOUBLE)) * 1000000 + 0.5) / 1000000
            ELSE 0.0e0 END AS entropy
FROM toks LEFT JOIN a ON toks.doc_id = a.doc_id
"""


# ---------------------------------------------------------------------------
# CCNet-style LM quality scoring: an add-one-smoothed bigram LM trained on a
# held-out split scores every document's average bigram log-likelihood
# (Wenzek et al. 2020 filter web text by LM perplexity; the 100-TB shape is
# identical — the LM is a FIXED small model broadcast to every worker, the
# corpus streams through a pure map)
# ---------------------------------------------------------------------------

LM_TRAIN_MOD = 10      # doc_id % 10 == 0 → the LM training split


def q_bigram_lm_score(sf_dir: str):
    """Per-doc average bigram log-likelihood under an add-one-smoothed
    bigram LM with counts from the ``doc_id % LM_TRAIN_MOD == 0`` split.

    avg_lp = (1/n) Σ_{distinct bigrams g=(w1,w2)} c_doc(g) ·
             log2((C(g) + 1) / (C_ctx(w1) + V))

    Determinism: all counts exact int64 (PMI-style sentinel-row partial
    aggregation, vocabulary-bounded); each term is ONE identically-spelled
    double expression on both engines; the per-doc sum groups by DISTINCT
    bigram with integer multiplicity on both engines, so only accumulation
    ORDER differs — the same far-from-boundary ulp argument (and log2 fuzz
    pin) as q_token_entropy; round6-truncated at the end.

    Scale: training counts pre-aggregate per batch into Counters (shuffle
    carries one row per (batch, bigram), vocabulary-bounded; an open-vocab
    corpus hashes bigrams to shards like q_top_tokens), the fitted LM is a
    broadcast dict, scoring is a shuffle-free map."""
    import math

    import ray
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def train_partial(t: pa.Table) -> pa.Table:
        bg_c: Counter = Counter()
        ctx_c: Counter = Counter()
        vocab: set = set()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for i, s in zip(ids, t["text"].to_pylist()):
            if int(i) % LM_TRAIN_MOD != 0:
                continue
            # NUL-prefixed tokens are reserved for the sentinel rows;
            # DuckDB VARCHAR cannot carry NULs, so an oracle-comparable
            # corpus has none — defensive skip only
            toks = [t for t in T.ascii_tokens(s)
                    if not t.startswith("\x00")]
            vocab.update(toks)
            ctx_c.update(toks[:-1])
            bg_c.update(zip(toks, toks[1:]))
        rows = {"a": [], "b": [], "n": []}
        for (a, b), n in bg_c.items():
            rows["a"].append(a)
            rows["b"].append(b)
            rows["n"].append(n)
        for a, n in ctx_c.items():          # sentinel: b = '' (tokens are
            rows["a"].append(a)             # non-empty by construction)
            rows["b"].append("")
            rows["n"].append(n)
        for a in vocab:                     # sentinel: vocab presence rows;
            rows["a"].append(a)             # the groupby collapses them to
            rows["b"].append("\x00v")       # one row per token, so the
            rows["n"].append(1)             # driver's row COUNT is |V|
        return pa.table({"a": pa.array(rows["a"], pa.string()),
                         "b": pa.array(rows["b"], pa.string()),
                         "n": pa.array(np.array(rows["n"], dtype=np.int64))})

    agg = (ds.map_batches(train_partial, batch_format="pyarrow")
             .groupby(["a", "b"])
             .aggregate(Sum("n", alias_name="n"))).to_pandas()
    vocab_rows = agg[agg["b"] == "\x00v"]
    v = float(len(vocab_rows))              # distinct tokens in train split
    ctx_rows = agg[agg["b"] == ""]
    ctx = dict(zip(ctx_rows["a"], ctx_rows["n"].astype(np.int64)))
    bg_rows = agg[(agg["b"] != "") & (agg["b"] != "\x00v")]
    bg = {(a, b): int(n) for a, b, n in
          zip(bg_rows["a"], bg_rows["b"], bg_rows["n"])}
    if v == 0:
        # no training docs → the LM is undefined; both engines emit zero
        # rows (the SQL filters on vocab.v > 0) instead of dividing by 0
        import ray.data as _rd
        return _rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "avg_lp": pa.array([], pa.float64())}))
    lm_ref = ray.put((bg, ctx, v))

    def score(t: pa.Table) -> pa.Table:
        bg_, ctx_, v_ = ray.get(lm_ref)
        out_ids, out_n, out_lp = [], [], []
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for i, s in zip(ids, t["text"].to_pylist()):
            toks = [tk for tk in T.ascii_tokens(s)
                    if not tk.startswith("\x00")]
            if len(toks) < 2:
                continue
            doc_bg = Counter(zip(toks, toks[1:]))
            n = len(toks) - 1
            acc = 0.0
            for g, c in doc_bg.items():
                acc += float(c) * math.log2(
                    (float(bg_.get(g, 0)) + 1.0)
                    / (float(ctx_.get(g[0], 0)) + v_))
            out_ids.append(int(i))
            out_n.append(n)
            out_lp.append(np.floor(acc / float(n) * 1e6 + 0.5) / 1e6)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "n_bigrams": pa.array(out_n, pa.int64()),
                         "avg_lp": pa.array(out_lp, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


Q_BIGRAM_LM_SQL = rf"""
WITH {_SQL_TOKS_IDX},
bg AS (
  SELECT doc_id, t AS w1, t || ' ' || lead(t, 1) OVER w AS g
  FROM idx WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(t, 1) OVER w IS NOT NULL
),
train_bg AS (
  SELECT g, COUNT(*) AS c FROM bg WHERE doc_id % {LM_TRAIN_MOD} = 0 GROUP BY g
),
train_ctx AS (
  SELECT w1, COUNT(*) AS c FROM bg WHERE doc_id % {LM_TRAIN_MOD} = 0 GROUP BY w1
),
vocab AS (
  SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS v
  FROM idx WHERE doc_id % {LM_TRAIN_MOD} = 0
),
doc_bg AS (
  SELECT doc_id, g, w1, COUNT(*) AS c FROM bg GROUP BY doc_id, g, w1
),
terms AS (
  SELECT d.doc_id, SUM(d.c) AS n,
         SUM(CAST(d.c AS DOUBLE)
             * log2((CAST(COALESCE(tb.c, 0) AS DOUBLE) + 1.0e0)
                    / (CAST(COALESCE(tc.c, 0) AS DOUBLE)
                       + (SELECT v FROM vocab)))) AS s
  FROM doc_bg d
  LEFT JOIN train_bg tb ON d.g = tb.g
  LEFT JOIN train_ctx tc ON d.w1 = tc.w1
  GROUP BY d.doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams,
       FLOOR(s / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 AS avg_lp
FROM terms
WHERE (SELECT v FROM vocab) > 0e0
"""


# ---------------------------------------------------------------------------
# composed curation pipeline: quality gate → embedding join → semantic dedup
# ---------------------------------------------------------------------------

def _curation_partial_sums(texts, doc, has_emb: np.ndarray,
                           sd_keep: np.ndarray) -> pa.Table:
    """ONE spelling of the per-batch curation funnel sums (both the
    broadcast and the join path feed it): Gopher gate → embedding
    membership → SemDeDup keep, each count exact int64."""
    gkeep = gopher_batch_stats(texts)["keep"].astype(bool)
    ntok = np.array([T.ws_token_count(s) for s in texts], dtype=np.int64)
    has_emb = gkeep & has_emb
    surv = has_emb & sd_keep
    return pa.table({
        "n_docs": pa.array([np.int64(len(texts))]),
        "n_gopher_kept": pa.array([np.int64(gkeep.sum())]),
        "n_with_embedding": pa.array([np.int64(has_emb.sum())]),
        "n_survivors": pa.array([np.int64(surv.sum())]),
        "survivor_tokens": pa.array([np.int64(ntok[surv].sum())]),
        "survivor_id_sum": pa.array([np.int64(doc[surv].sum())]),
    })


def x_curation_pipeline(sf_dir: str, broadcast_cap: int = None):
    """End-to-end curation summary: documents pass the Gopher repetition
    gate, survivors are joined to their embedding row (doc_id = vec_id;
    docs without one drop out — the fixture's embedding table covers a
    prefix of the corpus at larger sfs), and the SemDeDup verdict prunes
    semantic near-dups. One exact-integer summary row.

    Composition shape: q_semdedup emits one verdict row per embedding
    vector. Below ``broadcast_cap`` vectors the verdict broadcasts once
    via ``ray.put`` and the corpus-sized side is ONE map_batches pass
    carrying per-batch partial sums only. Above the cap it cuts over to a
    partitioned ``Dataset.join`` of the verdict table against documents
    keyed on doc_id — the q3/q5/semi-anti cutover discipline (the guard
    reads the embeddings parquet row count from file metadata, so the
    decision costs no data pass). Both paths share the same per-batch
    kernel and produce byte-identical integer sums (parity-tested with a
    forced cap of 0).
    """
    import os

    import pyarrow.parquet as pq
    import ray

    from . import corpus as C
    from .relational import BROADCAST_ROW_CAP

    if broadcast_cap is None:
        broadcast_cap = BROADCAST_ROW_CAP
    n_vec = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    from .common import single_row

    if n_vec > broadcast_cap:
        # cutover: verdict table stays a Dataset; partitioned hash join
        # against the corpus on doc_id — no O(#vectors) driver collection
        verd = C.q_semdedup(sf_dir).map_batches(
            lambda t: pa.table({"doc_id": t["vec_id"],
                                "sd_keep": t["keep"]}),
            batch_format="pyarrow")
        n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        joined = docs.join(verd, join_type="left_outer",
                           num_partitions=n_parts, on=("doc_id",))

        def partial_joined(t: pa.Table) -> pa.Table:
            texts = t.column("text").to_pylist()
            doc = t.column("doc_id").to_numpy(zero_copy_only=False)
            valid = t["sd_keep"].combine_chunks().is_valid()\
                .to_numpy(zero_copy_only=False)
            keep = pa.compute.fill_null(t["sd_keep"], 0)\
                .to_numpy(zero_copy_only=False).astype(bool)
            return _curation_partial_sums(texts, doc, valid, keep)

        parts = joined.map_batches(partial_joined,
                                   batch_format="pyarrow").to_pandas()
        return single_row({c: np.int64(parts[c].sum())
                           for c in parts.columns})

    sd = C.q_semdedup(sf_dir).to_pandas()
    keep_ids = np.sort(sd.loc[sd["keep"] == 1, "vec_id"].to_numpy())
    emb_ids = np.sort(sd["vec_id"].to_numpy())
    state = ray.put((keep_ids, emb_ids))

    def partial(t: pa.Table) -> pa.Table:
        kset, eset = ray.get(state)
        texts = t.column("text").to_pylist()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        return _curation_partial_sums(texts, doc,
                                      np.isin(doc, eset),
                                      np.isin(doc, kset))

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    return single_row({c: np.int64(parts[c].sum()) for c in parts.columns})


_WS_TOKENS_EXPR = (
    rf"CASE WHEN {_TRIM} = '' THEN 0 ELSE len(regexp_split_to_array("
    rf"{_TRIM}, '{SQL_ASCII_WS_PATTERN}')) END"
)


def curation_pipeline_sql(sf_dir: str) -> str:
    from . import corpus as C
    return f"""
WITH g AS ({Q_GOPHER_SQL}),
s AS ({C.semdedup_sql(sf_dir)}),
j AS (
  SELECT g.doc_id, g.keep AS gkeep,
         CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END AS has_emb,
         CASE WHEN g.keep = 1 AND s.keep = 1 THEN 1 ELSE 0 END AS surv0,
         {_WS_TOKENS_EXPR} AS ws_tokens
  FROM g
  LEFT JOIN s ON g.doc_id = s.vec_id
  JOIN documents ON documents.doc_id = g.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(gkeep) AS BIGINT) AS n_gopher_kept,
       CAST(SUM(CASE WHEN gkeep = 1 THEN has_emb ELSE 0 END) AS BIGINT)
         AS n_with_embedding,
       CAST(SUM(surv0) AS BIGINT) AS n_survivors,
       CAST(SUM(CASE WHEN surv0 = 1 THEN ws_tokens ELSE 0 END) AS BIGINT)
         AS survivor_tokens,
       CAST(SUM(CASE WHEN surv0 = 1 THEN doc_id ELSE 0 END) AS BIGINT)
         AS survivor_id_sum
FROM j
"""
