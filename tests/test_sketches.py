"""HyperLogLog sketch tests: rank/register kernels, merge-combiner
property, estimate accuracy at sketch-friendly cardinalities, and
driver-gate oracle parity."""

import numpy as np
import pytest

from deepseek_ocr_rs_ray.pipelines import sketches as SK

SF = "/root/testdata/sf0.001"


def test_hll_rank_edges():
    assert SK.hll_rank(0) == 57
    assert SK.hll_rank(1) == 56
    assert SK.hll_rank((1 << 56) - 1) == 1
    assert SK.hll_rank(1 << 55) == 1


def test_hll_registers_merge_is_max():
    """Sketch of a union == elementwise MAX of the parts' sketches — the
    combiner property the distributed partial-agg relies on."""
    a = [f"user{i}" for i in range(500)]
    b = [f"other{i}" for i in range(500)]
    ra, rb = SK.hll_registers(a), SK.hll_registers(b)
    rab = SK.hll_registers(a + b)
    assert np.array_equal(rab, np.maximum(ra, rb))


def test_hll_estimate_within_expected_error():
    """Raw estimator error ~1.04/sqrt(256) ≈ 6.5%; allow 3 sigma at a
    cardinality comfortably above m (no small-range correction here)."""
    n = 20000
    regs = SK.hll_registers(range(n))
    est = SK.hll_estimate_from_registers(regs)
    assert abs(est - n) / n < 0.20


def test_hll_sql_oracle_parity(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    ray_df = to_pandas(m.queries()["q_hll_users"](SF))
    sql_df = con.execute(m.oracle_sql_for(SF)["q_hll_users"]).fetchdf()
    assert compare("q_hll_users", ray_df, sql_df) == []


def test_cms_cols_deterministic_and_one_sided():
    """cms_cols is deterministic and in range; a hand-built counter matrix
    shows the estimator's one-sided property (min over addressed cells is
    >= the true count, exactly equal without collisions)."""
    from collections import Counter

    from deepseek_ocr_rs_ray.pipelines import sketches as S
    cols = S.cms_cols("hello")
    assert len(cols) == S.CMS_DEPTH
    assert all(0 <= c < S.CMS_WIDTH for c in cols)
    assert cols == S.cms_cols("hello")          # deterministic
    assert cols != S.cms_cols("world")
    # synthetic sketch over a small multiset
    counts = Counter({"alpha": 7, "beta": 3, "gamma": 11})
    cmat = np.zeros((S.CMS_DEPTH, S.CMS_WIDTH), dtype=np.int64)
    for tok, n in counts.items():
        for j, col in enumerate(S.cms_cols(tok)):
            cmat[j, col] += n
    for tok, n in counts.items():
        est = min(cmat[j, col] for j, col in enumerate(S.cms_cols(tok)))
        assert est >= n                          # never underestimates


def test_cms_sql_oracle_parity(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    ray_df = to_pandas(m.queries()["q_cms_tokens"](SF))
    assert (ray_df["overestimate"] >= 0).all()
    sql_df = con.execute(m.oracle_sql_for(SF)["q_cms_tokens"]).fetchdf()
    assert compare("q_cms_tokens", ray_df, sql_df) == []


def test_bloom_no_false_negatives_and_parity(ray_session):
    """Every true member passes the Bloom prefilter (no false negatives),
    so prefilter_pass >= n_orders always; oracle parity (dtype-strict)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    ray_df = to_pandas(m.queries()["q_bloom_semi_join"](SF))
    r = ray_df.iloc[0]
    assert r["prefilter_pass"] >= r["n_orders"]
    assert r["false_positives"] == r["prefilter_pass"] - r["n_orders"]
    assert 0 < r["bits_set"] <= min(3 * 10**6, r["bloom_m"])
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    sql_df = con.execute(m.oracle_sql_for(SF)["q_bloom_semi_join"]).fetchdf()
    assert compare("q_bloom_semi_join", ray_df, sql_df) == []
