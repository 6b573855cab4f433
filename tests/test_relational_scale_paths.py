"""The broadcast→join automatic cutover must be result-invariant: forcing
broadcast_cap=0 routes q3/q5 through the hash-partitioned Dataset.join
fallback, which must produce byte-identical output to the broadcast path."""

import pandas as pd
import pytest

from deepseek_ocr_rs_ray.pipelines import relational as R

SF = "/root/testdata/sf0.001"


def test_q3_join_fallback_parity(ray_session):
    a = R.q3_top_orders(SF)
    b = R.q3_top_orders(SF, broadcast_cap=0)
    pd.testing.assert_frame_equal(a, b)


def test_q5_join_fallback_parity(ray_session):
    a = R.q5_local_supplier_volume(SF)
    b = R.q5_local_supplier_volume(SF, broadcast_cap=0)
    pd.testing.assert_frame_equal(a, b)


def test_semi_anti_join_fallback_parity(ray_session):
    def canon(ds):
        return (ds.to_pandas().sort_values("has_orders")
                .reset_index(drop=True))
    a = canon(R.q_customers_semi_anti(SF))
    b = canon(R.q_customers_semi_anti(SF, broadcast_cap=0))
    pd.testing.assert_frame_equal(a, b)


def test_dup_clusters_distributed_fallback_parity(ray_session):
    from deepseek_ocr_rs_ray.pipelines import corpus as C
    a = C.q_dup_clusters(SF)
    b = C.q_dup_clusters(SF, pair_cap=0)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("qname", ["q_json_extract", "q_rollup_orders",
                                   "q_pivot_status", "q_left_join_nations"])
def test_relational_ext_sql_oracle_parity(ray_session, qname):
    """Driver-gate replication at sf0.001 for the round-3 relational adds
    (JSON extraction, ROLLUP, pivot, left outer join)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    con = duckdb.connect()
    for t in ("events", "orders", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    ray_df = to_pandas(m.queries()[qname](SF))
    sql_df = con.execute(m.oracle_sql_for(SF)[qname]).fetchdf()
    assert compare(qname, ray_df, sql_df) == []


def test_left_join_null_fill_path(ray_session):
    """At sf0.001 no customer clears the 9950 balance cut, so every nation
    must appear with the outer-join null-fill values (0 / 0 / 0.0)."""
    from deepseek_ocr_rs_ray.pipelines.relational import q_left_join_nations
    df = q_left_join_nations(SF)
    assert len(df) == 25
    assert (df["n_customers"] == 0).all()
    assert (df["sum_acctbal_cents"] == 0).all()
    assert (df["avg_acctbal_cents"] == 0.0).all()


def test_rollup_levels_consistent(ray_session):
    """Year rows equal the sum of their month rows; the grand total equals
    the sum of the year rows (rollup invariant)."""
    from deepseek_ocr_rs_ray.pipelines.relational import q_rollup_orders
    df = q_rollup_orders(SF)
    fine = df[(df.year != -1) & (df.month != -1)]
    years = df[(df.year != -1) & (df.month == -1)]
    total = df[(df.year == -1)]
    assert len(total) == 1
    assert fine["n_orders"].sum() == total["n_orders"].iloc[0]
    assert fine["revenue_cents"].sum() == total["revenue_cents"].iloc[0]
    per_year = fine.groupby("year")["revenue_cents"].sum()
    for _, r in years.iterrows():
        assert per_year[r.year] == r.revenue_cents


def test_ntile_distributed_rank_parity(ray_session):
    """The two-phase shard-rank NTILE must be invariant to the bucket
    granularity: order_bits=2 (≤4 coarse buckets — near-degenerate) and the
    default must be byte-identical; and at the default granularity each
    segment genuinely splits across multiple value buckets, i.e. no task
    sees a whole segment."""
    import numpy as np

    from deepseek_ocr_rs_ray.pipelines.relational import (f64_order_bucket,
                                                          q_ntile_balance)

    def canon(ds):
        return (ds.to_pandas()
                .sort_values(["c_mktsegment", "c_custkey"])
                .reset_index(drop=True))

    a = canon(q_ntile_balance(SF))
    b = canon(q_ntile_balance(SF, order_bits=2))
    pd.testing.assert_frame_equal(a, b)
    # the default granularity actually partitions each segment's values
    import pyarrow.parquet as pq
    bal = pq.read_table(f"{SF}/customer.parquet",
                        columns=["c_acctbal"])["c_acctbal"]
    n_buckets = len(np.unique(f64_order_bucket(
        bal.to_numpy(zero_copy_only=False))))
    assert n_buckets > 5   # many more value buckets than segments


def test_percentiles_distributed_select_parity(ray_session):
    """Distributed order-statistic selection: coarse (order_bits=2) and
    default granularities must agree exactly — both pick the identical
    input element for every (type, quantile)."""
    from deepseek_ocr_rs_ray.pipelines.relational import q_value_percentiles

    def canon(df):
        return df.sort_values("event_type").reset_index(drop=True)

    a = canon(q_value_percentiles(SF))
    b = canon(q_value_percentiles(SF, order_bits=2))
    pd.testing.assert_frame_equal(a, b)


def test_ntile_sizes_and_order(ray_session):
    """NTILE(4): per segment, bucket sizes differ by at most 1 with larger
    buckets first, and quartile is monotone in (acctbal, custkey) order."""
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    from deepseek_ocr_rs_ray.pipelines.relational import q_ntile_balance
    df = to_pandas(q_ntile_balance(SF))
    for seg, g in df.groupby("c_mktsegment"):
        sizes = g["quartile"].value_counts().sort_index()
        assert sizes.max() - sizes.min() <= 1
        assert (sizes.diff().dropna() <= 0).all()   # larger buckets first
    con = duckdb.connect()
    con.execute("CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{SF}/customer.parquet')")
    sql_df = con.execute(m.oracle_sql_for(SF)["q_ntile_balance"]).fetchdf()
    assert compare("q_ntile_balance", df, sql_df) == []


def test_decontaminate_join_fallback_parity(ray_session):
    """broadcast_cap=0 forces the exploded distributed-join path — must be
    row-identical to the broadcast set-probe path."""
    from deepseek_ocr_rs_ray.pipelines import corpus as C

    def canon(ds):
        return (ds.to_pandas().astype({"doc_id": "int64", "n_hits": "int64"})
                [["doc_id", "n_hits"]]
                .sort_values("doc_id").reset_index(drop=True))
    a = canon(C.q_decontaminate(SF))
    b = canon(C.q_decontaminate(SF, broadcast_cap=0))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("qname", ["q_decontaminate", "q_bigram_lm_score",
                                   "x_png_features", "q_heavy_user_sets"])
def test_round4_sql_oracle_parity(ray_session, qname):
    """Driver-gate replication at sf0.001 for the round-4 adds
    (benchmark decontamination, bigram-LM quality scoring, PNG ingestion,
    INTERSECT/EXCEPT set labeling)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    con = duckdb.connect()
    for view in ("documents", "events"):
        con.execute(f"CREATE VIEW {view} AS SELECT * FROM "
                    f"read_parquet('{SF}/{view}.parquet')")
    ray_df = to_pandas(m.queries()[qname](SF))
    sql_df = con.execute(m.oracle_sql_for(SF)[qname]).fetchdf()
    assert compare(qname, ray_df, sql_df) == []


def test_rank_orders_granularity_parity(ray_session):
    """RANK/DENSE_RANK via two-phase order-bucket rank: near-degenerate
    bucket granularity (order_bits=2) must agree with the default."""
    from deepseek_ocr_rs_ray.pipelines.relational import q_rank_orders

    def canon(ds):
        return (ds.to_pandas().sort_values("o_orderkey")
                .reset_index(drop=True))
    a = canon(q_rank_orders(SF))
    b = canon(q_rank_orders(SF, order_bits=2))
    pd.testing.assert_frame_equal(a, b)


def test_rank_orders_heavy_ties(ray_session, tmp_path):
    """Deliberately tie-heavy orders table: both rank variants must match
    DuckDB's window functions exactly (min-rank ties, dense run ordinals)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepseek_ocr_rs_ray.pipelines.relational import (Q_RANK_ORDERS_SQL,
                                                          q_rank_orders)
    rng = np.random.default_rng(3)
    n = 500
    t = pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_orderpriority": pa.array(
            [f"{k}-P" for k in rng.integers(1, 4, n)]),
        # few distinct prices → massive tie runs, some spanning batches;
        # -0.0 vs 0.0 are SQL rank PEERS (equal) with distinct bit
        # patterns — the f64_order_bucket canonicalization case
        "o_totalprice": pa.array(
            rng.choice([10.0, 20.0, 20.5, 30.0, -5.25, 0.0, -0.0, 10.0],
                       n)),
    })
    d = tmp_path / "tieorders"
    d.mkdir()
    pq.write_table(t, str(d / "orders.parquet"))
    ray_df = (q_rank_orders(str(tmp_path / "tieorders"))
              .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{d}/orders.parquet')")
    sql_df = (con.execute(Q_RANK_ORDERS_SQL).fetchdf()
              .sort_values("o_orderkey").reset_index(drop=True))
    for col in ("o_orderkey", "price_rank", "price_dense_rank"):
        assert (ray_df[col].to_numpy() == sql_df[col].to_numpy()).all(), col
    assert (ray_df["o_totalprice"].to_numpy()
            == sql_df["o_totalprice"].to_numpy()).all()
    assert (ray_df["price_rank"] != ray_df["price_dense_rank"]).any()


def test_percentile_cont_parity_and_semantics(ray_session):
    """Interpolated quantiles: coarse/default bucket granularities agree
    exactly; values agree with DuckDB's builtin quantile_cont to within
    the round6 grid (the oracle intentionally spells the interpolation
    explicitly rather than calling the builtin — see the docstring)."""
    import duckdb
    import numpy as np

    from deepseek_ocr_rs_ray.pipelines.relational import (
        q_value_percentiles_cont)

    def canon(df):
        return df.sort_values("event_type").reset_index(drop=True)

    a = canon(q_value_percentiles_cont(SF))
    b = canon(q_value_percentiles_cont(SF, order_bits=2))
    pd.testing.assert_frame_equal(a, b)

    con = duckdb.connect()
    ref = con.execute(
        f"""SELECT event_type, quantile_cont(value, 0.5) p50,
            quantile_cont(value, 0.9) p90, quantile_cont(value, 0.99) p99
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY event_type ORDER BY event_type""").fetchdf()
    for col in ("p50", "p90", "p99"):
        assert np.allclose(a[col].to_numpy(), ref[col].to_numpy(),
                           rtol=0, atol=2e-6), col


def test_oversized_buckets_capped_cutover_parity(ray_session):
    """key_cap=0 forces _oversized_buckets through the crc-folded
    distributed count path — the {key: m} map and the downstream pair set
    must both match the streamed-count path exactly."""
    import ray.data

    from deepseek_ocr_rs_ray.pipelines import corpus as C

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text", "source"])
    plain = C._oversized_buckets(docs, "source", cap=10)
    folded = C._oversized_buckets(docs, "source", cap=10, key_cap=0)
    assert plain == folded and len(plain) > 0

    def canon(ds):
        return (ds.to_pandas()[["a", "b", "jaccard"]]
                .sort_values(["a", "b"]).reset_index(drop=True))

    a = canon(C.q_jaccard_pairs(SF, bucket_cap=10))
    C.BUCKET_KEY_CAP, saved = 0, C.BUCKET_KEY_CAP
    try:
        b = canon(C.q_jaccard_pairs(SF, bucket_cap=10))
    finally:
        C.BUCKET_KEY_CAP = saved
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)
