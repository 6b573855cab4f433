"""Corpus-operator tests: minhash/LSH behavior, simhash locality, ANN
recall, plus driver-style oracle replication for a few SQL-backed queries."""

import numpy as np
import pytest

from deepseek_ocr_rs_ray.pipelines import corpus as C

SF = "/root/testdata/sf0.001"


def jaccard_est(a: np.ndarray, b: np.ndarray) -> float:
    return float((a == b).mean())


def test_minhash_estimates_jaccard():
    a = C._minhash_params()
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = "the quick brown fox jumps over the lazy cat " * 5  # near-dup
    t3 = "completely different content with other words entirely " * 5
    s1, s2, s3 = (C.minhash_signature(t, a) for t in (t1, t2, t3))
    h1, h2 = C.shingle_hashes(t1), C.shingle_hashes(t2)
    true_j = np.intersect1d(h1, h2, assume_unique=True).size / \
        np.union1d(h1, h2).size
    assert abs(jaccard_est(s1, s2) - true_j) < 0.25
    assert jaccard_est(s1, s2) > 0.5
    assert jaccard_est(s1, s3) < 0.3


def test_minhash_signatures_batch_parity():
    """Batched segmented-reduceat signatures == per-doc kernel, including
    the edge cases (empty doc, shorter-than-k doc, unicode, duplicates)."""
    a = C._minhash_params()
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "", "   ", "ab", "abcd",                   # empty / sub-k docs
        "Hello   WORLD  hello world",              # normalization
        "héllo wörld ünïcode ça va",               # multibyte utf-8
        "aaaaa aaaaa aaaaa",                       # duplicate shingles
        "x" * 5000,
    ]
    got = C.minhash_signatures_batch(texts, a)
    want = np.stack([C.minhash_signature(t, a) for t in texts])
    assert np.array_equal(got, want)


def test_shingle_hashes_deterministic_and_normalized():
    a = C.shingle_hashes("Hello   World")
    b = C.shingle_hashes("hello world")   # case + whitespace collapse
    assert np.array_equal(a, b)
    assert C.shingle_hashes("").size == 0


def test_simhash_locality():
    t1 = "spark ray data engine pipeline shuffle partition " * 3
    t2 = t1 + "extra"
    t3 = "unrelated words about cooking pasta tomatoes basil"
    h1, h2, h3 = C.simhash64(t1), C.simhash64(t2), C.simhash64(t3)
    d12 = bin(h1 ^ h2).count("1")
    d13 = bin(h1 ^ h3).count("1")
    assert d12 < d13
    assert d12 <= 16


def test_minhash_pairs_verified_and_recall(ray_session):
    got = C.q_minhash_pairs(SF, threshold=0.5)  # returns pandas now
    got_pairs = set(zip(got["a"], got["b"]))
    # every returned pair is exactly verified >= threshold (by construction);
    # recall check: every strongly-similar pair (j >= 0.8) must be found
    import pyarrow.parquet as pq
    docs = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    hs = {i: C.shingle_hashes(t) for i, t in zip(ids, texts)}
    strong = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = hs[ids[i]], hs[ids[j]]
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = a.size + b.size - inter
            jac = inter / union if union else 0.0
            if jac >= 0.8:
                strong.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
            if jac >= 0.5:
                # anything the pipeline returned must agree with brute force
                pass
    assert strong.issubset(got_pairs)
    # and all returned pairs really are >= 0.5 per brute force
    for a, b in got_pairs:
        ha, hb = hs[a], hs[b]
        inter = np.intersect1d(ha, hb, assume_unique=True).size
        union = ha.size + hb.size - inter
        assert inter / union >= 0.5


def test_minhash_near_threshold_naive_parity(ray_session, tmp_path):
    """Distributed LSH == single-process naive port on a corpus engineered
    to sit NEAR the 0.5 threshold (the regime where the estimate-prefilter
    margin and banding S-curve actually bite), plus precision exactness vs
    brute force. This pins the MINHASH_EST_MARGIN semantics: whatever the
    margin admits/drops, both engines must agree pair-for-pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(0xBEEF)
    vocab = [f"tok{k}" for k in range(2000)]
    ids, texts = [], []
    did = 0
    # 9 pairs whose word overlap sweeps across the threshold band
    for frac in (0.30, 0.40, 0.45, 0.50, 0.55, 0.60, 0.70, 0.85, 0.95):
        base = [vocab[i] for i in rng.integers(0, 2000, size=150)]
        keep = int(len(base) * frac)
        tail = [vocab[i] for i in rng.integers(0, 2000,
                                               size=len(base) - keep)]
        ids += [did, did + 1]
        texts += [" ".join(base), " ".join(base[:keep] + tail)]
        did += 2
    # background noise docs
    for _ in range(30):
        ids.append(did)
        texts.append(" ".join(vocab[i]
                              for i in rng.integers(0, 2000, size=120)))
        did += 1
    sf = str(tmp_path)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   sf + "/documents.parquet")
    got = C.q_minhash_pairs(sf, threshold=0.5)
    expected = C._expected_minhash_pairs(sf, threshold=0.5).to_pandas()
    assert got.reset_index(drop=True).equals(expected)
    # precision is exact by construction: brute-force check every pair
    hs = {i: C.shingle_hashes(t) for i, t in zip(ids, texts)}
    found = set(zip(got["a"], got["b"]))
    strong = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = hs[ids[i]], hs[ids[j]]
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = a.size + b.size - inter
            jac = inter / union if union else 0.0
            if jac >= 0.75:
                strong.add((ids[i], ids[j]))
    for a, b in found:
        ha, hb = hs[a], hs[b]
        inter = np.intersect1d(ha, hb, assume_unique=True).size
        assert inter / (ha.size + hb.size - inter) >= 0.5
    # recall: well-above-threshold pairs must all survive margin + banding
    assert strong and strong.issubset(found)
    # q_minhash_dedup composes these pairs into keep-first components:
    # every verified pair shares a canonical id, canonicals are component
    # minima, keep == (doc == canonical), and non-dup docs keep themselves
    ded = C.q_minhash_dedup(sf, threshold=0.5).to_pandas()
    canon = dict(zip(ded["doc_id"], ded["canonical_id"]))
    assert set(ded["doc_id"]) == set(ids)
    for a, b in found:
        assert canon[a] == canon[b] <= min(a, b)
    assert (ded["keep"] == (ded["doc_id"] == ded["canonical_id"])
            .astype("int64")).all()
    paired = {d for p in found for d in p}
    solo = ded[~ded["doc_id"].isin(paired)]
    assert (solo["doc_id"] == solo["canonical_id"]).all()


def test_ann_ivf_recall(ray_session):
    approx = C.q_ann_ivf(SF).reset_index(drop=True)
    exact = C.q_knn_cosine(SF).reset_index(drop=True)
    assert approx.iloc[0]["vec_id"] == 0 and approx.iloc[0]["cos"] == 1.0
    # probing 4/16 cells must recover a reasonable share of the true top-10,
    # and every returned cos must agree with brute force
    em = dict(zip(exact["vec_id"], exact["cos"]))
    overlap = sum(1 for v in approx["vec_id"] if v in em)
    assert overlap >= 3
    for _, r in approx.iterrows():
        if r["vec_id"] in em:
            assert r["cos"] == em[r["vec_id"]]
    # determinism: centroids and result reproduce exactly
    again = C.q_ann_ivf(SF).reset_index(drop=True)
    assert again.equals(approx)


def test_ann_lsh_contains_self_and_agrees_with_bruteforce(ray_session):
    approx = C.q_ann_lsh(SF).reset_index(drop=True)
    exact = C.q_knn_cosine(SF).reset_index(drop=True)
    # the query vector itself always lands in its own bucket
    assert approx.iloc[0]["vec_id"] == 0 and approx.iloc[0]["cos"] == 1.0
    # cos values agree with brute force for every common id
    em = dict(zip(exact["vec_id"], exact["cos"]))
    for _, r in approx.iterrows():
        if r["vec_id"] in em:
            assert r["cos"] == em[r["vec_id"]]


@pytest.mark.parametrize("qname", ["q_dedup_exact", "q_token_stats",
                                   "q_knn_cosine", "q_jaccard_vs_doc0"])
def test_sql_oracle_parity_small(ray_session, qname):
    """Driver-gate replication at sf0.001 for a representative slice."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    import duckdb
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    ray_df = to_pandas(m.queries()[qname](SF))
    sql_df = con.execute(m.oracle_sql_for(SF)[qname]).fetchdf()
    assert compare(qname, ray_df, sql_df) == []


def test_langid_pipeline_deterministic_and_plausible(ray_session):
    a = C.q_langid(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = C.q_langid(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # fixture docs are English-ish word salads: the heuristic should lean en
    counts = a["lang_pred"].value_counts(normalize=True)
    assert counts.get("en", 0) > 0.5


def _canon_pairs(df):
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df[sorted(df.columns)]


@pytest.mark.parametrize("qfn,kwargs", [
    (C.q_jaccard_pairs, {}),
    (C.q_jaccard_bigram_pairs, {}),
    (C.q_embed_dup_pairs, {}),
])
def test_capped_bucket_pairs_blocked_equals_plain(ray_session, qfn, kwargs):
    """Forcing the triangle-block decomposition (tiny bucket_cap) must
    produce the exact same pair set as the plain single-task bucket path —
    every unordered pair covered exactly once, identical float values."""
    plain = _canon_pairs(qfn(SF, bucket_cap=10**9, **kwargs).to_pandas())
    blocked = _canon_pairs(qfn(SF, bucket_cap=13, **kwargs).to_pandas())
    assert len(plain) > 0
    assert plain.equals(blocked)


def test_semdedup_invariants_and_parity(ray_session):
    """SemDeDup: every dropped vector names a kept-eligible lower id in its
    own cluster; keeps are exactly the rows without a lower near-dup; the
    SQL oracle agrees row-for-row (driver-gate replication)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    df = to_pandas(m.queries()["q_semdedup"](SF)).sort_values("vec_id")
    assert set(df["keep"].unique()) <= {0, 1}
    dropped = df[df["keep"] == 0]
    assert len(dropped) > 0                      # tau chosen to bite
    assert (dropped["dup_of"] < dropped["vec_id"]).all()
    cl = dict(zip(df["vec_id"], df["cluster"]))
    assert all(cl[d] == cl[v] for v, d in
               zip(dropped["vec_id"], dropped["dup_of"]))
    assert (df.loc[df["keep"] == 1, "dup_of"] == -1).all()

    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    sql_df = con.execute(m.oracle_sql_for(SF)["q_semdedup"]).fetchdf()
    assert compare("q_semdedup", df, sql_df) == []


def test_semdedup_cluster_count_scales_with_corpus(ray_session, tmp_path):
    """semdedup_k grows with the embedding count (k ≈ n/target, clipped),
    so the per-cluster O((n/k)²) block stays bounded as the corpus grows;
    and q_semdedup stays oracle-exact at a k above the IVF floor."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepseek_ocr_rs_ray.pipelines import corpus as C

    assert C.semdedup_k("/root/testdata/sf0.001") == C.IVF_CLUSTERS  # floor
    assert (C.semdedup_k("/root/testdata/sf0.1")
            > C.semdedup_k("/root/testdata/sf0.01"))                 # scales

    # synthetic corpus big enough for k > floor: 3200 vectors → k = 32
    import numpy as np
    rng = np.random.default_rng(7)
    n, dim = 3200, 64
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(emb), pa.list_(pa.float32(), dim)),
        "label": pa.array(np.zeros(n, dtype=np.int32)),
    }), str(d / "embeddings.parquet"))
    k = C.semdedup_k(str(d))
    assert k == n // C.SEMDEDUP_TARGET_CLUSTER_ROWS > C.IVF_CLUSTERS
    df = (C.q_semdedup(str(d)).to_pandas()
          .sort_values("vec_id").reset_index(drop=True))
    assert df["cluster"].nunique() > C.IVF_CLUSTERS   # k genuinely in play
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")
    sql_df = con.execute(C.semdedup_sql(str(d))).fetchdf()
    from tools.check_correctness import compare
    assert compare("q_semdedup", df, sql_df) == []


@pytest.mark.parametrize("qname", ["q_pmi_pairs", "q_inverted_index"])
def test_cooccurrence_sql_oracle_parity(ray_session, qname):
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    ray_df = to_pandas(m.queries()[qname](SF))
    sql_df = con.execute(m.oracle_sql_for(SF)[qname]).fetchdf()
    assert compare(qname, ray_df, sql_df) == []


def test_inverted_index_postings_semantics(ray_session):
    """Postings are the smallest doc_ids ascending, capped; n_docs counts
    ALL docs containing the token (not the cap)."""
    from deepseek_ocr_rs_ray.pipelines.corpus import (INVIDX_POSTINGS_CAP,
                                                      q_inverted_index)
    df = q_inverted_index(SF).to_pandas()
    assert (df["n_docs"] > 0).all()
    for _, r in df.iterrows():
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r["n_docs"], INVIDX_POSTINGS_CAP)


def test_minhash_dedup_distributed_cutover_parity(ray_session):
    """Forcing a tiny pair_cap routes q_minhash_dedup through the
    distributed label-propagation + join path; output must be identical
    to the broadcast fast path."""
    fast = (C.q_minhash_dedup(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    dist = (C.q_minhash_dedup(SF, pair_cap=1).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert fast.equals(dist)
    assert (fast.loc[fast["keep"] == 1, "canonical_id"]
            == fast.loc[fast["keep"] == 1, "doc_id"]).all()
