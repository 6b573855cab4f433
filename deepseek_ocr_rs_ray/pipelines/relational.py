"""Relational operator catalogue over the TPC-H-ish test tables.

Each entry maps a reference operator family (SURVEY.md §2) onto Ray Data
primitives with the scale patterns the 100 TB story needs:

- pre-aggregation: per-batch partial aggregates inside ``map_batches``
  before the (small) global ``groupby`` shuffle (G1-family);
- broadcast joins: small sides shipped once via ``ray.put`` and probed
  per batch (J1-family, "snapshot lookup" semantics);
- partitioned hash join: ``Dataset.join`` for large⋈large (orders⋈lineitem);
- local-then-global top-k (T-family): per-batch top-k before the tiny sort;
- event-time windows/sessions: ``groupby(key).map_groups`` over ts-sorted
  groups (§2.9 — Ray Data has no native windows);
- as-of join: per-key ``merge_asof`` inside co-grouped map_groups.

Every function takes ``sf_dir`` and returns a Dataset / pandas DataFrame /
Arrow table whose column names match the paired oracle SQL exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import cents_arr, cents_np, read_dim, read_table, single_row


def probe_sorted(keys_sorted: np.ndarray, values: np.ndarray,
                 probe: np.ndarray, default) -> np.ndarray:
    """Vectorized dict-probe: values[lookup(probe)] with ``default`` for
    misses, via searchsorted over a sorted key array (no per-row Python).
    The broadcast-join building block for dimension lookups."""
    idx = np.clip(np.searchsorted(keys_sorted, probe), 0,
                  max(len(keys_sorted) - 1, 0))
    if len(keys_sorted) == 0:
        return np.full(len(probe), default)
    hit = keys_sorted[idx] == probe
    return np.where(hit, values[idx], default)


ORDER_BUCKET_BITS = 16


def f64_order_bucket(x: np.ndarray, bits: int = ORDER_BUCKET_BITS) -> np.ndarray:
    """Order-preserving bucket id for float64 values (NaN-free): the IEEE
    bit pattern mapped monotonically to uint64 (negatives bit-flipped,
    positives sign-flipped), truncated to the top ``bits`` bits.

    x < y  ⇒  bucket(x) <= bucket(y), and equal values always share a
    bucket — the range-partitioning primitive the distributed rank /
    order-statistic queries build on. Purely value-local (no sampling, no
    driver pass), so any worker computes the same bucket for the same
    value at any parallelism.

    ``+ 0.0`` first: -0.0 == +0.0 numerically (SQL rank treats them as
    peers) but their bit patterns differ — the addition canonicalizes
    -0.0 to +0.0 so the equal-values-share-a-bucket invariant holds for
    the one equal-but-bitwise-distinct float pair.
    """
    b = (np.ascontiguousarray(x, dtype=np.float64) + 0.0).view(np.uint64)
    neg = b >> np.uint64(63) != 0
    mono = np.where(neg, ~b, b | np.uint64(1 << 63))
    return (mono >> np.uint64(64 - bits)).astype(np.int64)

CUTOFF = "1998-09-02"
Q3_DATE = "1998-03-15"
Q5_DATE_LO, Q5_DATE_HI = "1996-01-01", "1998-01-01"


# ---------------------------------------------------------------------------
# q1: grouped aggregate with partial pre-aggregation (G1 analogue)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "lineitem",
                    ["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"],
                                   pa.scalar(np.datetime64(CUTOFF, "us"))))
        base_cents = cents_arr(t["l_extendedprice"])
        disc_expr = pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"]))
        disc_cents = cents_arr(disc_expr)
        qty = pc.cast(t["l_quantity"], pa.int64())
        tmp = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": qty, "base": base_cents, "disc": disc_cents,
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        return tmp.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc", "sum"), ("n", "sum")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("qty_sum", alias_name="sum_qty"),
                        Sum("base_sum", alias_name="sum_base_cents"),
                        Sum("disc_sum", alias_name="sum_disc_cents"),
                        Sum("n_sum", alias_name="count_order")))

    df = agg.to_pandas()  # a handful of rows
    df["avg_qty"] = df["sum_qty"].astype(np.float64) / df["count_order"].astype(np.float64)
    df["avg_base_cents"] = df["sum_base_cents"].astype(np.float64) / df["count_order"].astype(np.float64)
    return df


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)/COUNT(*) AS avg_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/COUNT(*) AS avg_base_cents
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3: broadcast semi-join + grouped revenue + top-k (J1 + T-family)
# ---------------------------------------------------------------------------

BROADCAST_ROW_CAP = 2_000_000  # above this, broadcast sides cut over to Dataset.join
TOPK_SHARDS = 64


def _li_revenue_partial(t: pa.Table) -> pa.Table:
    """Per-batch lineitem revenue pre-agg for q3 (shipdate > cut, per order)."""
    t = t.filter(pc.greater(t["l_shipdate"],
                            pa.scalar(np.datetime64(Q3_DATE, "us"))))
    rev = cents_arr(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"])))
    tmp = pa.table({"o_orderkey": t["l_orderkey"], "rev": rev})
    return tmp.group_by("o_orderkey").aggregate([("rev", "sum")])


def _tag_okey_shard(t: pa.Table) -> pa.Table:
    return t.append_column(
        "shard", pc.bit_wise_and(pc.cast(t["o_orderkey"], pa.int64()),
                                 TOPK_SHARDS - 1))


def q3_top_orders(sf_dir: str, broadcast_cap: int = BROADCAST_ROW_CAP):
    """Scale notes: the filtered-customer key set and the filtered-order map
    are dimension-sized (a few % of orders); they are collected once on the
    driver and broadcast via ray.put — the guide's small-side join pattern.
    If the filtered-order side outgrows ``broadcast_cap`` rows the query
    cuts over automatically to a hash-partitioned Dataset.join
    (_q3_join_fallback). The final revenue rollup never runs a Ray groupby
    over raw order keys (high-cardinality shuffle): partial sums co-locate
    under TOPK_SHARDS hash shards, each shard reduces + takes its local
    top-10 vectorized, and the driver reduces <= 10*shards rows.
    """
    import ray

    cust = read_dim(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust_keys = set(cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))
                    ["c_custkey"].to_pylist())

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    ckeys_ref = ray.put(np.array(sorted(cust_keys), dtype=np.int64))

    def filter_orders(t: pa.Table) -> pa.Table:
        keys = ray.get(ckeys_ref)
        t = t.filter(pc.less(t["o_orderdate"],
                             pa.scalar(np.datetime64(Q3_DATE, "us"))))
        mask = np.isin(t["o_custkey"].to_numpy(zero_copy_only=False), keys)
        return t.filter(pa.array(mask)).select(["o_orderkey", "o_orderdate"])

    o_small = orders.map_batches(filter_orders, batch_format="pyarrow")
    okeys = {}
    for b in o_small.iter_batches(batch_format="pyarrow"):
        for k, d in zip(b["o_orderkey"].to_pylist(), b["o_orderdate"].to_pylist()):
            okeys[k] = d
        if len(okeys) > broadcast_cap:
            return _q3_join_fallback(sf_dir, o_small)
    okeys_ref = ray.put(np.array(sorted(okeys), dtype=np.int64))

    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(okeys_ref)
        mask = np.isin(t["l_orderkey"].to_numpy(zero_copy_only=False), keys)
        return _li_revenue_partial(t.filter(pa.array(mask)))

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("o_orderkey")["rev_sum"].sum().reset_index()
        s = s.rename(columns={"rev_sum": "revenue_cents"})
        return s.sort_values(["revenue_cents", "o_orderkey"],
                             ascending=[False, True]).head(10)

    df = (li.map_batches(partial, batch_format="pyarrow")
            .map_batches(_tag_okey_shard, batch_format="pyarrow")
            .groupby("shard").map_groups(shard_topk, batch_format="pandas")
            .to_pandas())
    df = df.sort_values(["revenue_cents", "o_orderkey"],
                        ascending=[False, True]).head(10).reset_index(drop=True)
    df["o_orderdate"] = df["o_orderkey"].map(okeys)
    # [us] matches DuckDB's fetchdf timestamp unit (raw epoch values must
    # agree for the driver's value hash, not just the instants)
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"]).astype("datetime64[us]")
    return df[["o_orderkey", "revenue_cents", "o_orderdate"]]


def _q3_join_fallback(sf_dir: str, o_small):
    """Both-sides-big path: lineitem partial sums hash-join the filtered
    orders on o_orderkey, then the same sharded top-k reduce as the
    broadcast path."""
    import ray
    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    li_agg = li.map_batches(_li_revenue_partial, batch_format="pyarrow")
    n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    joined = li_agg.join(o_small, join_type="inner", num_partitions=n_parts,
                         on=("o_orderkey",))

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["o_orderkey", "o_orderdate"])["rev_sum"]
              .sum().reset_index().rename(columns={"rev_sum": "revenue_cents"}))
        return s.sort_values(["revenue_cents", "o_orderkey"],
                             ascending=[False, True]).head(10)

    df = (joined.map_batches(_tag_okey_shard, batch_format="pyarrow")
                .groupby("shard").map_groups(shard_topk, batch_format="pandas")
                .to_pandas())
    df = df.sort_values(["revenue_cents", "o_orderkey"],
                        ascending=[False, True]).head(10).reset_index(drop=True)
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"]).astype("datetime64[us]")
    return df[["o_orderkey", "revenue_cents", "o_orderdate"]]


Q3_SQL = f"""
SELECT o_orderkey,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5: broadcast dimensions + partitioned hash join (Dataset.join) + groupby
# ---------------------------------------------------------------------------

def q5_local_supplier_volume(sf_dir: str,
                             broadcast_cap: int = BROADCAST_ROW_CAP):
    import ray
    from ray.data.aggregate import Sum

    region = read_dim(sf_dir, "region").to_pandas()
    nation = read_dim(sf_dir, "nation").to_pandas()
    rkey = region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    nations = nation[nation["n_regionkey"] == rkey]
    nation_names = dict(zip(nations["n_nationkey"].astype(np.int64),
                            nations["n_name"]))

    cust = read_dim(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nation_names)]
    cust = cust.sort_values("c_custkey")
    supp = read_dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp.sort_values("s_suppkey")

    # sorted key/value arrays, not dicts: probed vectorized per batch
    cust_ref = ray.put((cust["c_custkey"].to_numpy(np.int64),
                        cust["c_nationkey"].to_numpy(np.int64)))
    supp_ref = ray.put((supp["s_suppkey"].to_numpy(np.int64),
                        supp["s_nationkey"].to_numpy(np.int64)))

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def orders_in_region(t: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_ref)
        lo = pa.scalar(np.datetime64(Q5_DATE_LO, "us"))
        hi = pa.scalar(np.datetime64(Q5_DATE_HI, "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        nk = probe_sorted(ck, cn, keys, -1)
        out = pa.table({"o_orderkey": t["o_orderkey"],
                        "cust_nation": pa.array(nk)})
        return out.filter(pc.not_equal(out["cust_nation"], pa.scalar(-1)))

    o_small = orders.map_batches(orders_in_region, batch_format="pyarrow")

    # the filtered order side is a few % of orders — broadcast it once
    # (ray.put) and probe per batch instead of an all-to-all hash join;
    # above broadcast_cap rows it cuts over to a Dataset.join automatically
    order_nation: dict = {}
    for b in o_small.iter_batches(batch_format="pyarrow"):
        for k, n in zip(b["o_orderkey"].to_pylist(),
                        b["cust_nation"].to_pylist()):
            order_nation[k] = n
        if len(order_nation) > broadcast_cap:
            return _q5_join_fallback(sf_dir, o_small, supp_ref, nation_names)
    onat_keys = np.fromiter(sorted(order_nation), dtype=np.int64,
                            count=len(order_nation))
    onat_vals = np.array([order_nation[int(k)] for k in onat_keys],
                         dtype=np.int64)
    onat_ref = ray.put((onat_keys, onat_vals))

    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        ok, on = ray.get(onat_ref)
        sk, sn = ray.get(supp_ref)
        okeys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        skeys = t["l_suppkey"].to_numpy(zero_copy_only=False)
        cust_nat = probe_sorted(ok, on, okeys, -1)
        s_nat = probe_sorted(sk, sn, skeys, -2)
        keep = cust_nat == s_nat
        if not keep.any():
            # must match the aggregated (group_by-suffixed) schema below
            return pa.table({"nationkey": pa.array([], pa.int64()),
                             "rev_sum": pa.array([], pa.int64())})
        t = t.filter(pa.array(keep))
        rev = cents_arr(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0), t["l_discount"])))
        tmp = pa.table({"nationkey": pa.array(cust_nat[keep]), "rev": rev})
        return tmp.group_by("nationkey").aggregate([("rev", "sum")])

    agg = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("nationkey")
             .aggregate(Sum("rev_sum", alias_name="revenue_cents")))
    df = agg.to_pandas()
    df["n_name"] = df["nationkey"].map(nation_names)
    df = df[["n_name", "revenue_cents"]].sort_values(
        "revenue_cents", ascending=False).reset_index(drop=True)
    return df


def _q5_join_fallback(sf_dir: str, o_small, supp_ref, nation_names):
    """Both-sides-big path for q5: lineitem rows (tagged with the supplier
    nation via the broadcast supplier dimension) hash-join the filtered
    orders on o_orderkey; nation match filtered post-join, then the tiny
    per-nation rollup."""
    import ray
    from ray.data.aggregate import Sum
    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_prep(t: pa.Table) -> pa.Table:
        sk, sn = ray.get(supp_ref)
        skeys = t["l_suppkey"].to_numpy(zero_copy_only=False)
        s_nat = probe_sorted(sk, sn, skeys, -2)
        rev = cents_arr(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0), t["l_discount"])))
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "s_nat": pa.array(s_nat), "rev": rev})

    n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    joined = (li.map_batches(li_prep, batch_format="pyarrow")
                .join(o_small, join_type="inner", num_partitions=n_parts,
                      on=("o_orderkey",)))

    def post(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["s_nat"], t["cust_nation"]))
        tmp = pa.table({"nationkey": t["cust_nation"], "rev": t["rev"]})
        return tmp.group_by("nationkey").aggregate([("rev", "sum")])

    agg = (joined.map_batches(post, batch_format="pyarrow")
                 .groupby("nationkey")
                 .aggregate(Sum("rev_sum", alias_name="revenue_cents")))
    df = agg.to_pandas()
    df["n_name"] = df["nationkey"].map(nation_names)
    return (df[["n_name", "revenue_cents"]]
            .sort_values("revenue_cents", ascending=False)
            .reset_index(drop=True))


Q5_SQL = f"""
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_LO} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_DATE_HI} 00:00:00'
GROUP BY n_name
ORDER BY revenue_cents DESC
"""


# ---------------------------------------------------------------------------
# large ⋈ large partitioned hash join (Dataset.join) + grouped rollup
# ---------------------------------------------------------------------------

def q_hash_join_agg(sf_dir: str):
    """Unfiltered lineitem ⋈ orders via Ray's hash-partitioned Dataset.join —
    the both-sides-big pattern (neither side broadcastable at corpus scale) —
    then revenue rollup by order priority.

    lineitem is pre-aggregated per batch by l_orderkey BEFORE the join
    (revenue already reduced to integer cents + a row count), so the join
    shuffle moves ~4x fewer rows with a narrower payload; orderkeys are
    unique in orders, so summing the reduced rows after the inner join is
    exact. Locally equal (interleaved A/B, BASELINE.md round 4); at corpus
    scale the shuffle-volume reduction is the win."""
    import ray
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        rev = cents_arr(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0), t["l_discount"])))
        tmp = pa.table({"l_orderkey": t["l_orderkey"], "rev": rev,
                        "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by("l_orderkey").aggregate(
            [("rev", "sum"), ("n", "sum")])

    li_red = li.map_batches(partial, batch_format="pyarrow")
    n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    joined = li_red.join(orders, join_type="inner", num_partitions=n_parts,
                         on=("l_orderkey",), right_on=("o_orderkey",))

    def partial2(t: pa.Table) -> pa.Table:
        return (pa.table({"o_orderpriority": t["o_orderpriority"],
                          "rev_sum": t["rev_sum"], "n_sum": t["n_sum"]})
                .group_by("o_orderpriority")
                .aggregate([("rev_sum", "sum"), ("n_sum", "sum")]))

    return (joined.map_batches(partial2, batch_format="pyarrow")
                  .groupby("o_orderpriority")
                  .aggregate(Sum("rev_sum_sum", alias_name="revenue_cents"),
                             Sum("n_sum_sum", alias_name="n_lineitems")))


Q_HASH_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# filter + project (M-family vectorized map)
# ---------------------------------------------------------------------------

def q_filter_project(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_linenumber", "l_quantity",
                     "l_extendedprice", "l_discount", "l_shipdate"])

    def f(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64("1996-01-01", "us"))
        hi = pa.scalar(np.datetime64("1997-01-01", "us"))
        m = pc.and_(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                            pc.less(t["l_shipdate"], hi)),
                    pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                            pc.and_(pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                                    pc.less(t["l_quantity"], pa.scalar(24.0)))))
        t = t.filter(m)
        rev = cents_arr(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0), t["l_discount"])))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": t["l_linenumber"],
                         "revenue_cents": rev})

    return ds.map_batches(f, batch_format="pyarrow")


Q_FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# top-k: local per-batch top-k, then tiny global sort+limit (T1/T5)
# ---------------------------------------------------------------------------

def q_topk_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        cents = cents_arr(t["o_totalprice"])
        tmp = pa.table({"o_orderkey": t["o_orderkey"], "total_cents": cents})
        idx = pc.select_k_unstable(tmp, k=10,
                                   sort_keys=[("total_cents", "descending"),
                                              ("o_orderkey", "ascending")])
        return tmp.take(idx)

    reduced = ds.map_batches(local_topk, batch_format="pyarrow")
    df = reduced.to_pandas()
    return (df.sort_values(["total_cents", "o_orderkey"],
                           ascending=[False, True])
              .head(10).reset_index(drop=True))


Q_TOPK_SQL = """
SELECT o_orderkey, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents
FROM orders
ORDER BY total_cents DESC, o_orderkey ASC
LIMIT 10
"""


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: promo revenue share for one ship month — the
    broadcast-dimension probe (part is dimension-sized; its p_type flags
    ship once via ray.put as a sorted key array + membership bitmap) with
    a two-accumulator per-batch pre-agg and a single-row result."""
    import ray
    from ray.data.aggregate import Sum

    part = read_dim(sf_dir, "part", ["p_partkey", "p_type"])
    keys = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    promo = pc.equal(part["p_type"], "PROMO").to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    pref = ray.put((keys[order], promo[order]))

    li = read_table(sf_dir, "lineitem",
                    ["l_partkey", "l_extendedprice", "l_discount",
                     "l_shipdate"])
    lo = pa.scalar(np.datetime64("1997-03-01", "us"))
    hi = pa.scalar(np.datetime64("1997-04-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        pkeys, is_promo = ray.get(pref)
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        rev = cents_arr(pc.multiply(t["l_extendedprice"],
                                    pc.subtract(pa.scalar(1.0),
                                                t["l_discount"])))
        rev_np = rev.to_numpy(zero_copy_only=False)
        idx = np.searchsorted(pkeys, t["l_partkey"]
                              .to_numpy(zero_copy_only=False))
        idx = np.clip(idx, 0, len(pkeys) - 1)
        hit = is_promo[idx]
        return pa.table({
            "promo_cents": pa.array([np.int64(rev_np[hit].sum())]),
            "total_cents": pa.array([np.int64(rev_np.sum())]),
        })

    agg = (li.map_batches(partial, batch_format="pyarrow")
             .groupby(None)
             .aggregate(Sum("promo_cents", alias_name="promo_cents"),
                        Sum("total_cents", alias_name="total_cents")))
    df = agg.to_pandas()
    df["promo_cents"] = df["promo_cents"].astype("int64")
    df["total_cents"] = df["total_cents"].astype("int64")
    df["promo_share"] = (df["promo_cents"].astype(np.float64)
                         / df["total_cents"].astype(np.float64))
    return df[["promo_cents", "total_cents", "promo_share"]]


Q_PROMO_REVENUE_SQL = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


def q_orders_global_sort(sf_dir: str):
    """Global ``Dataset.sort`` (range-partitioned all-to-all) + limit —
    the wide sort operator exercised end-to-end. For small k the
    local-then-global top-k (q_topk_orders) is the preferred plan; this
    entry demonstrates (and gates) the full sort path itself, with a
    deterministic (total_cents DESC, o_orderkey ASC) key."""
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "total_cents": cents_arr(t["o_totalprice"])})

    return (ds.map_batches(prep, batch_format="pyarrow")
              .sort(["total_cents", "o_orderkey"], descending=[True, False])
              .limit(100))


Q_GLOBAL_SORT_SQL = """
SELECT o_orderkey, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents
FROM orders
ORDER BY total_cents DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# distinct / grouped count (D-family)
# ---------------------------------------------------------------------------

def q_segment_counts(sf_dir: str):
    from ray.data.aggregate import Count
    ds = read_table(sf_dir, "customer", ["c_mktsegment"])
    return (ds.groupby("c_mktsegment")
              .aggregate(Count(alias_name="n_customers")))


Q_SEGMENT_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# union + distinct (set ops)
# ---------------------------------------------------------------------------

def q_union_distinct(sf_dir: str):
    """UNION-distinct count via per-batch unique → hash-shard groupby →
    per-shard nunique → tiny sum (Ray's ``unique`` would be one group per
    distinct key — the high-cardinality shuffle the repo rule forbids)."""
    N_SHARDS = 64

    def side(col_filter):
        def f(t: pa.Table) -> pa.Table:
            t = col_filter(t)
            u = np.unique(t["o_orderkey"].to_numpy(zero_copy_only=False))
            return pa.table({"o_orderkey": pa.array(u),
                             "shard": pa.array(u & (N_SHARDS - 1))})
        return f

    a = read_table(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]) \
        .map_batches(side(lambda t: t.filter(
            pc.equal(t["o_orderstatus"], "F"))), batch_format="pyarrow")
    b = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"]) \
        .map_batches(side(lambda t: t.filter(
            pc.greater(t["o_totalprice"], pa.scalar(200000.0)))),
            batch_format="pyarrow")

    def shard_nunique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g["o_orderkey"].nunique())]})

    parts = (a.union(b).groupby("shard")
             .map_groups(shard_nunique, batch_format="pandas").to_pandas())
    return single_row({"n_orders": int(parts["n"].sum())})


Q_UNION_SQL = """
SELECT COUNT(*) AS n_orders FROM (
  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
  UNION
  SELECT o_orderkey FROM orders WHERE o_totalprice > 200000
)
"""


# ---------------------------------------------------------------------------
# calendar rollup (timestamp projection + grouped agg)
# ---------------------------------------------------------------------------

def q_orders_by_month(sf_dir: str):
    from ray.data.aggregate import Sum
    ds = read_table(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        y = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        m = pc.cast(pc.month(t["o_orderdate"]), pa.int64())
        cents = cents_arr(t["o_totalprice"])
        tmp = pa.table({"year": y, "month": m, "cents": cents,
                        "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by(["year", "month"]).aggregate(
            [("cents", "sum"), ("n", "sum")])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["year", "month"])
              .aggregate(Sum("cents_sum", alias_name="sum_total_cents"),
                         Sum("n_sum", alias_name="n_orders")))


Q_MONTH_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS month,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_total_cents,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# event-time tumbling window (§2.9 streaming analogue)
# ---------------------------------------------------------------------------

def q_events_hourly(sf_dir: str):
    from ray.data.aggregate import Sum
    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        cents = cents_arr(t["value"])
        tmp = pa.table({"event_type": t["event_type"], "window_start": win,
                        "cents": cents,
                        "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by(["event_type", "window_start"]).aggregate(
            [("cents", "sum"), ("n", "sum")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["event_type", "window_start"])
             .aggregate(Sum("cents_sum", alias_name="sum_value_cents"),
                        Sum("n_sum", alias_name="n_events")))
    return agg.map_batches(_window_start_us, batch_format="pyarrow")


def _window_start_us(t: pa.Table) -> pa.Table:
    """floor_temporal emits timestamp[s]; recast to [us] so the epoch ints
    the driver hashes match DuckDB's fetchdf unit."""
    i = t.schema.get_field_index("window_start")
    return t.set_column(i, "window_start",
                        pc.cast(t["window_start"], pa.timestamp("us")))


Q_EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# sliding window: vectorized event→window expansion, then grouped agg
# ---------------------------------------------------------------------------

SLIDE_US = 15 * 60 * 1_000_000          # 15-minute slide
WINDOW_US = 60 * 60 * 1_000_000         # 1-hour window


def q_events_sliding(sf_dir: str):
    """Sliding 1h windows every 15min: each event expands to the <=4 windows
    containing it (vectorized np.repeat inside map_batches — the flat_map
    shape without per-row python), then the usual pre-agg + groupby."""
    from ray.data.aggregate import Sum
    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def expand(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        # first slide-aligned window start in (ts - WINDOW, ts]
        first_ws = (np.floor_divide(ts - WINDOW_US, SLIDE_US) + 1) * SLIDE_US
        k = WINDOW_US // SLIDE_US
        offs = np.arange(k, dtype=np.int64) * SLIDE_US
        ws = (first_ws[:, None] + offs[None, :]).reshape(-1)
        rep_ts = np.repeat(ts, k)
        # ws >= 0 mirrors the oracle's epoch guard for events inside the
        # first hour after the Unix epoch (ADVICE r01)
        keep = (rep_ts >= ws) & (rep_ts < ws + WINDOW_US) & (ws >= 0)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), k)[keep]
        # Arrow take keeps the string column off the Python heap
        etype = pc.take(t["event_type"], pa.array(idx))
        cents = cents_np(t["value"].to_numpy(zero_copy_only=False))[idx]
        tmp = pa.table({
            "event_type": etype,
            "window_start": pa.array(ws[keep].view("datetime64[us]")),
            "cents": pa.array(cents),
            "n": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
        })
        return tmp.group_by(["event_type", "window_start"]).aggregate(
            [("cents", "sum"), ("n", "sum")])

    agg = (ds.map_batches(expand, batch_format="pyarrow")
             .groupby(["event_type", "window_start"])
             .aggregate(Sum("cents_sum", alias_name="sum_value_cents"),
                        Sum("n_sum", alias_name="n_events")))
    return agg.map_batches(_window_start_us, batch_format="pyarrow")


Q_EVENTS_SLIDING_SQL = """
WITH w AS (
  SELECT DISTINCT event_type,
         to_timestamp((epoch_us(ts) // 900000000 - s.i) * 900000000 / 1000000)::TIMESTAMP AS window_start
  FROM events, (SELECT unnest(generate_series(0, 3)) AS i) s
  WHERE epoch_us(ts) // 900000000 - s.i >= 0
)
SELECT e.event_type, w.window_start,
       CAST(SUM(CAST(FLOOR(e.value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n_events
FROM events e JOIN w
  ON e.event_type = w.event_type
 AND e.ts >= w.window_start
 AND e.ts <  w.window_start + INTERVAL 1 HOUR
GROUP BY e.event_type, w.window_start
"""


# ---------------------------------------------------------------------------
# deterministic hash sampling (T3's seeded-sampling contract, SQL-matchable)
# ---------------------------------------------------------------------------

def q_sample_docs(sf_dir: str):
    """Deterministic 1/16 sample of documents by md5-prefix — the
    distributed analogue of seeded sampling (crates/core/src/sampling.rs:26-31:
    reproducible selection independent of partitioning/retries)."""
    from ..functions.textops import md5_hex
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        keep_ids = [i for i, s in zip(ids, texts) if md5_hex(s)[0] == "0"]
        return pa.table({"doc_id": pa.array(keep_ids, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


Q_SAMPLE_SQL = "SELECT doc_id FROM documents WHERE substr(md5(text), 1, 1) = '0'"

SESSION_GAP_US = 30 * 60 * 1_000_000


def q_events_sessionize(sf_dir: str):
    """Gap-based sessionization, hash-bucket co-grouped (64 buckets, never
    one group per user) with a vectorized per-bucket pandas pass."""
    N_BUCKETS = 64
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def tag(t: pa.Table) -> pa.Table:
        k = pc.cast(t["user_id"], pa.int64())
        return pa.table({"bucket": pc.bit_wise_and(k, N_BUCKETS - 1),
                         "user_id": k, "event_id": t["event_id"],
                         "ts": t["ts"]})

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds() * 1e6
        g["is_start"] = (gaps.isna() | (gaps > SESSION_GAP_US)).astype(np.int64)
        out = (g.groupby("user_id")
                .agg(n_sessions=("is_start", "sum"),
                     n_events=("is_start", "size")).reset_index())
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "n_sessions", "n_events"]]

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("bucket").map_groups(sessionize,
                                            batch_format="pandas"))


Q_SESSIONIZE_SQL = f"""
SELECT user_id,
       CAST(SUM(CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_US}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM (SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events)
GROUP BY user_id
"""


def q_event_gaps(sf_dir: str):
    """Per-user inter-event gap stats — the LAG window family. Hash-bucket
    co-group + vectorized per-bucket diff; all-integer microsecond outputs
    so both engines agree exactly. Users with <2 events emit no row."""
    N_BUCKETS = 64
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def tag(t: pa.Table) -> pa.Table:
        k = pc.cast(t["user_id"], pa.int64())
        return pa.table({"bucket": pc.bit_wise_and(k, N_BUCKETS - 1),
                         "user_id": k, "event_id": t["event_id"],
                         "ts": t["ts"]})

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        # integer epoch-µs diff — total_seconds() goes through float64 and
        # loses µs precision at ~1e11-µs gaps
        us = g["ts"].astype("datetime64[us]").astype("int64")
        g = g.assign(gap_us=us.groupby(g["user_id"]).diff())
        g = g[g["gap_us"].notna()]
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "n_gaps": pd.Series([], dtype="int64"),
                                 "sum_gap_us": pd.Series([], dtype="int64"),
                                 "max_gap_us": pd.Series([], dtype="int64")})
        g["gap_us"] = g["gap_us"].astype("int64")
        out = (g.groupby("user_id")["gap_us"]
                .agg(n_gaps="size", sum_gap_us="sum", max_gap_us="max")
                .reset_index())
        for c in ("n_gaps", "sum_gap_us", "max_gap_us"):
            out[c] = out[c].astype("int64")
        return out

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("bucket").map_groups(gaps, batch_format="pandas"))


Q_EVENT_GAPS_SQL = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events)
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# running totals: the SQL window-function family over co-grouped state
# ---------------------------------------------------------------------------

def q_events_running_total(sf_dir: str):
    """Per-user running sum of value cents in (ts, event_id) order — the
    SUM() OVER (PARTITION BY ... ORDER BY ...) family. Hash-bucketed
    co-grouping (64 buckets) + vectorized pandas cumsum per bucket; exact
    int64 cents make the running sums order-robust and oracle-identical."""
    N_BUCKETS = 64
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def tag(t: pa.Table) -> pa.Table:
        k = pc.cast(t["user_id"], pa.int64())
        return pa.table({"bucket": pc.bit_wise_and(k, N_BUCKETS - 1),
                         "user_id": k, "event_id": t["event_id"],
                         "ts": t["ts"],
                         "cents": pa.array(
                             cents_np(t["value"].to_numpy(zero_copy_only=False)))})

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        g["running_cents"] = g.groupby("user_id")["cents"].cumsum()
        return g[["event_id", "user_id", "running_cents"]]

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("bucket").map_groups(running, batch_format="pandas"))


Q_RUNNING_TOTAL_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS running_cents
FROM events
"""


# ---------------------------------------------------------------------------
# ranked top-N per group (ROW_NUMBER window family)
# ---------------------------------------------------------------------------

def q_top3_orders_per_segment(sf_dir: str):
    """Top-3 orders by value within each market segment — the ranked-window
    (ROW_NUMBER OVER PARTITION BY) family. Segment lookup is a broadcast
    dimension probe; per-batch local top-3 per segment collapses the stream
    before the tiny global reduce (5 segments × 3 rows)."""
    import ray
    cust = read_dim(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    seg = np.asarray(cust["c_mktsegment"].to_pylist(), dtype=object)
    order = np.argsort(ck, kind="stable")
    seg_ref = ray.put((ck[order], seg[order]))

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                           "o_totalprice"])

    def local_top(t: pa.Table) -> pa.Table:
        ck_s, seg_s = ray.get(seg_ref)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        g = pd.DataFrame({
            "c_mktsegment": probe_sorted(ck_s, seg_s, keys, None),
            "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False),
            "total_cents": cents_arr(t["o_totalprice"]).to_numpy(zero_copy_only=False),
        })
        # batch-level top-3 PER SEGMENT (a global cut could let one segment
        # crowd out another's top rows); any dataset-level top-3 element is
        # necessarily a batch-level top-3 of its segment
        g = g.sort_values(["c_mktsegment", "total_cents", "o_orderkey"],
                          ascending=[True, False, True])
        return pa.Table.from_pandas(g.groupby("c_mktsegment").head(3),
                                    preserve_index=False)

    df = orders.map_batches(local_top, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["c_mktsegment", "total_cents", "o_orderkey"],
                        ascending=[True, False, True])
    df["rank"] = df.groupby("c_mktsegment").cumcount() + 1
    out = df[df["rank"] <= 3].reset_index(drop=True)
    return out[["c_mktsegment", "rank", "o_orderkey", "total_cents"]]


Q_TOP3_PER_SEGMENT_SQL = """
SELECT c_mktsegment, rank, o_orderkey, total_cents FROM (
  SELECT c_mktsegment,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) DESC,
                                     o_orderkey ASC) AS rank,
         o_orderkey,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# semi / anti join via broadcast key set (the guide's no-shuffle pattern)
# ---------------------------------------------------------------------------

SEMI_ANTI_KEY_CAP = int(os.environ.get("GRAFT_SEMI_ANTI_KEY_CAP",
                                       "5000000"))


def q_customers_semi_anti(sf_dir: str, broadcast_cap: int = None):
    """Customers with vs without orders: broadcast-key-set semi/anti join.

    The distinct o_custkey set is computed RAY-SIDE (per-batch np.unique
    compaction → 64-way hash-shard groupby → per-shard unique), so the
    driver only ever collects the already-distinct, dimension-sized key
    set for the ray.put broadcast — it never streams fact-table batches
    (VERDICT r01: driver OOM at 10^12 orders). The collection itself is
    cap-guarded (the same broadcast_cap → distributed-cutover discipline
    as q3/q5/minhash): past ``broadcast_cap`` keys the broadcast is
    abandoned for a hash-partitioned left-outer ``Dataset.join`` of
    customer against the marked distinct-key Dataset — no driver-side key
    set at any cardinality."""
    import ray
    from ray.data.aggregate import Count
    if broadcast_cap is None:
        broadcast_cap = SEMI_ANTI_KEY_CAP
    orders = read_table(sf_dir, "orders", ["o_custkey"])

    N_SHARDS = 64

    def batch_unique(t: pa.Table) -> pa.Table:
        u = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"o_custkey": pa.array(u),
                         "shard": pa.array(u & (N_SHARDS - 1))})

    def shard_unique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_custkey": np.unique(g["o_custkey"].to_numpy())})

    distinct = (orders.map_batches(batch_unique, batch_format="pyarrow")
                      .groupby("shard")
                      .map_groups(shard_unique, batch_format="pandas"))

    cust = read_table(sf_dir, "customer", ["c_custkey"])

    parts = []
    n_keys = 0
    over = False
    for b in distinct.iter_batches(batch_format="pyarrow"):
        parts.append(b["o_custkey"].to_numpy(zero_copy_only=False))
        n_keys += b.num_rows
        if n_keys > broadcast_cap:
            over = True
            break

    if over:
        # distributed cutover: mark the distinct keys, left-outer join
        def mark(t: pa.Table) -> pa.Table:
            return pa.table({"c_custkey": t["o_custkey"],
                             "has": pa.array(
                                 np.ones(t.num_rows, dtype=bool))})

        marked = distinct.map_batches(mark, batch_format="pyarrow")
        n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        joined = cust.join(marked, join_type="left_outer",
                           num_partitions=n_parts, on=("c_custkey",))

        def classify_joined(t: pa.Table) -> pa.Table:
            has = pc.fill_null(t["has"], False)
            return pa.table({"has_orders": has})

        return (joined.map_batches(classify_joined, batch_format="pyarrow")
                      .groupby("has_orders")
                      .aggregate(Count(alias_name="n_customers")))

    keys_ref = ray.put(np.sort(np.concatenate(parts))
                       if parts else np.array([], dtype=np.int64))

    def classify(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        has = np.isin(t["c_custkey"].to_numpy(zero_copy_only=False), ks)
        return pa.table({"has_orders": pa.array(has),
                         "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    return (cust.map_batches(classify, batch_format="pyarrow")
                .groupby("has_orders")
                .aggregate(Count(alias_name="n_customers")))


Q_SEMI_ANTI_SQL = """
SELECT EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders,
       COUNT(*) AS n_customers
FROM customer GROUP BY 1
"""


# ---------------------------------------------------------------------------
# per-group discrete percentiles (exact order statistics)
# ---------------------------------------------------------------------------

PCT_STATS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


def q_value_percentiles(sf_dir: str, order_bits: int = ORDER_BUCKET_BITS):
    """p50/p90/p99 of event values per type as exact order statistics —
    sorted[ceil(q*n)-1], DuckDB's quantile_disc convention, so the selected
    element (an unmodified input double) matches the oracle bit-for-bit.

    Distributed selection, not whole-group sorts: values range-partition
    into order-preserving buckets (``f64_order_bucket``); pass 1
    pre-aggregates per-(type, bucket) counts (a bounded-cardinality
    groupby), the driver prefix-sums them to locate the single bucket
    holding each target rank, and pass 2 touches ONLY those buckets —
    each task sorts one bucket of one type (~group/2^bits of the data),
    never an entire group. Degenerate distributions (every value equal)
    collapse to one bucket = one whole-group sort, i.e. never worse than
    the naive shape.
    """
    import ray
    from ray.data.aggregate import Sum

    def counts_partial(t: pa.Table) -> pa.Table:
        b = f64_order_bucket(t["value"].to_numpy(zero_copy_only=False),
                             order_bits)
        tmp = pa.table({"event_type": t["event_type"],
                        "bucket": pa.array(b),
                        "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by(["event_type", "bucket"]).aggregate(
            [("n", "sum")])

    counts = (read_table(sf_dir, "events", ["event_type", "value"])
              .map_batches(counts_partial, batch_format="pyarrow")
              .groupby(["event_type", "bucket"])
              .aggregate(Sum("n_sum", alias_name="n"))
              .to_pandas())

    empty = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                          "p50": pd.Series([], dtype=np.float64),
                          "p90": pd.Series([], dtype=np.float64),
                          "p99": pd.Series([], dtype=np.float64),
                          "n_events": pd.Series([], dtype=np.int64)})
    if counts.empty:
        return empty             # empty events table: 0 groups, 0 rows

    # driver plan: per type, which bucket holds each target rank and at
    # what local (in-bucket) rank — O(types × stats) rows, tiny
    plan: dict = {}          # (event_type, bucket) -> [(stat, local_rank)]
    totals: dict = {}
    for etype, g in counts.groupby("event_type"):
        g = g.sort_values("bucket")
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        buckets = g["bucket"].to_numpy(dtype=np.int64)
        n = int(cum[-1])
        totals[etype] = n
        for stat, q in PCT_STATS:
            t_rank = int(np.ceil(q * n))        # identical expr to the oracle
            i = int(np.searchsorted(cum, t_rank))
            local = t_rank - (int(cum[i - 1]) if i else 0)
            plan.setdefault((etype, int(buckets[i])), []).append((stat, local))
    plan_ref = ray.put(plan)

    def keep_targets(t: pa.Table) -> pa.Table:
        p = ray.get(plan_ref)
        b = f64_order_bucket(t["value"].to_numpy(zero_copy_only=False),
                             order_bits)
        # O(types × stats) vectorized equality passes — no per-row Python
        mask = np.zeros(t.num_rows, dtype=bool)
        for (e, bk) in p:
            mask |= (pc.equal(t["event_type"], pa.scalar(e))
                     .to_numpy(zero_copy_only=False) & (b == bk))
        t = t.filter(pa.array(mask))
        return t.append_column("bucket", pa.array(
            f64_order_bucket(t["value"].to_numpy(zero_copy_only=False),
                             order_bits)))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(plan_ref)
        key = (g["event_type"].iloc[0], int(g["bucket"].iloc[0]))
        v = np.sort(g["value"].to_numpy(dtype=np.float64))
        stats = p[key]
        return pd.DataFrame({
            "event_type": [key[0]] * len(stats),
            "stat": [s for s, _ in stats],
            "value": [v[r - 1] for _, r in stats],
        })

    picked = (read_table(sf_dir, "events", ["event_type", "value"])
              .map_batches(keep_targets, batch_format="pyarrow")
              .groupby(["event_type", "bucket"])
              .map_groups(pick, batch_format="pandas")
              .to_pandas())
    out = (picked.pivot(index="event_type", columns="stat", values="value")
           .reset_index())
    out.columns.name = None
    out["n_events"] = out["event_type"].map(totals).astype("int64")
    return out[["event_type", "p50", "p90", "p99", "n_events"]]


Q_PERCENTILES_SQL = """
SELECT event_type,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.9)  AS p90,
       quantile_disc(value, 0.99) AS p99,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q_value_percentiles_cont(sf_dir: str,
                             order_bits: int = ORDER_BUCKET_BITS):
    """Interpolated (PERCENTILE_CONT-style) per-type quantiles — the
    continuous companion of q_value_percentiles' exact order statistics.

    Same two-phase distributed selection (bounded-cardinality count
    groupby → driver rank plan → only the target buckets are touched),
    fetching BOTH bracketing elements x[k], x[k+1] at pos = q·(n−1), then
    one interpolation ``x_lo·(1−frac) + x_hi·frac`` round6-truncated.
    Cross-engine determinism: DuckDB's builtin quantile_cont differs from
    any hand expression by ulps (measured: 14/300 fuzz mismatches), so
    the SQL oracle spells the SAME selection + interpolation expression
    explicitly instead of calling the builtin — both engines evaluate
    identical IEEE operations on identical operands.
    """
    import ray
    from ray.data.aggregate import Sum

    counts = (read_table(sf_dir, "events", ["event_type", "value"])
              .map_batches(lambda t: _pct_counts_partial(t, order_bits),
                           batch_format="pyarrow")
              .groupby(["event_type", "bucket"])
              .aggregate(Sum("n_sum", alias_name="n"))
              .to_pandas())
    cols = ["event_type"] + [s for s, _ in PCT_STATS] + ["n_events"]
    if counts.empty:
        return pd.DataFrame({c: pd.Series(
            [], dtype=(object if c == "event_type"
                       else np.int64 if c == "n_events" else np.float64))
            for c in cols})

    plan: dict = {}   # (etype, bucket) -> [(stat, role, local_rank)]
    totals: dict = {}
    fracs: dict = {}  # (etype, stat) -> frac
    for etype, g in counts.groupby("event_type"):
        g = g.sort_values("bucket")
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        buckets = g["bucket"].to_numpy(dtype=np.int64)
        n = int(cum[-1])
        totals[etype] = n
        for stat, q in PCT_STATS:
            pos = q * float(n - 1)          # same expr as the oracle SQL
            k = int(np.floor(pos))
            fracs[(etype, stat)] = pos - float(k)
            for role, rank1 in (("lo", k + 1), ("hi", min(k + 2, n))):
                i = int(np.searchsorted(cum, rank1))
                local = rank1 - (int(cum[i - 1]) if i else 0)
                plan.setdefault((etype, int(buckets[i])), []).append(
                    (stat, role, local))
    plan_ref = ray.put(plan)

    def keep_targets(t: pa.Table) -> pa.Table:
        p = ray.get(plan_ref)
        b = f64_order_bucket(t["value"].to_numpy(zero_copy_only=False),
                             order_bits)
        mask = np.zeros(t.num_rows, dtype=bool)
        for (e, bk) in p:
            mask |= (pc.equal(t["event_type"], pa.scalar(e))
                     .to_numpy(zero_copy_only=False) & (b == bk))
        t = t.filter(pa.array(mask))
        return t.append_column("bucket", pa.array(
            f64_order_bucket(t["value"].to_numpy(zero_copy_only=False),
                             order_bits)))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(plan_ref)
        key = (g["event_type"].iloc[0], int(g["bucket"].iloc[0]))
        v = np.sort(g["value"].to_numpy(dtype=np.float64))
        entries = p[key]
        return pd.DataFrame({
            "event_type": [key[0]] * len(entries),
            "stat": [s for s, _, _ in entries],
            "role": [r for _, r, _ in entries],
            "value": [v[rk - 1] for _, _, rk in entries],
        })

    picked = (read_table(sf_dir, "events", ["event_type", "value"])
              .map_batches(keep_targets, batch_format="pyarrow")
              .groupby(["event_type", "bucket"])
              .map_groups(pick, batch_format="pandas")
              .to_pandas())
    rows = {"event_type": []}
    for s, _ in PCT_STATS:
        rows[s] = []
    rows["n_events"] = []
    by = {(r.event_type, r.stat, r.role): r.value
          for r in picked.itertuples()}
    for etype in sorted(totals):
        rows["event_type"].append(etype)
        for stat, _q in PCT_STATS:
            vlo = by[(etype, stat, "lo")]
            vhi = by[(etype, stat, "hi")]
            frac = fracs[(etype, stat)]
            val = vlo * (1.0 - frac) + vhi * frac   # same expr as the SQL
            rows[stat].append(np.floor(val * 1e6 + 0.5) / 1e6)
        rows["n_events"].append(np.int64(totals[etype]))
    out = pd.DataFrame(rows)
    out["n_events"] = out["n_events"].astype("int64")
    return out[cols]


def _pct_counts_partial(t: pa.Table, order_bits: int) -> pa.Table:
    b = f64_order_bucket(t["value"].to_numpy(zero_copy_only=False),
                         order_bits)
    tmp = pa.table({"event_type": t["event_type"],
                    "bucket": pa.array(b),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
    return tmp.group_by(["event_type", "bucket"]).aggregate([("n", "sum")])


def _pct_cont_sql() -> str:
    stats = ", ".join(f"('{s}', {q}e0)" for s, q in PCT_STATS)
    cases = ",\n       ".join(
        f"FLOOR(MAX(CASE WHEN stat = '{s}' THEN interp END) * 1000000"
        f" + 0.5) / 1000000 AS {s}" for s, _ in PCT_STATS)
    return f"""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), targets(stat, q) AS (VALUES {stats}),
pos AS (
  SELECT d.event_type, t.stat, t.q, d.n,
         t.q * CAST(d.n - 1 AS DOUBLE) AS pos,
         CAST(FLOOR(t.q * CAST(d.n - 1 AS DOUBLE)) AS BIGINT) AS k
  FROM (SELECT DISTINCT event_type, n FROM ranked) d, targets t
),
sel AS (
  SELECT p.event_type, p.stat, p.n,
         lo.value * (1e0 - (p.pos - CAST(p.k AS DOUBLE)))
           + hi.value * (p.pos - CAST(p.k AS DOUBLE)) AS interp
  FROM pos p
  JOIN ranked lo ON lo.event_type = p.event_type AND lo.rn = p.k + 1
  JOIN ranked hi ON hi.event_type = p.event_type
       AND hi.rn = LEAST(p.k + 2, p.n)
)
SELECT event_type,
       {cases},
       CAST(MAX(n) AS BIGINT) AS n_events
FROM sel GROUP BY event_type
"""


Q_PERCENTILES_CONT_SQL = _pct_cont_sql()


# ---------------------------------------------------------------------------
# as-of join: latest order at-or-before each event (J-family, merge_asof)
# ---------------------------------------------------------------------------

def q_asof_last_order(sf_dir: str):
    import ray.data
    events = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    # deterministic representative per (custkey, orderdate): max orderkey —
    # an ASOF join against tied timestamps is otherwise nondeterministic.
    # The per-batch pre-dedup runs here; the GLOBAL dedup happens inside the
    # same hash-bucket co-group as the asof itself (a Ray groupby on the raw
    # (custkey, orderdate) key would be one group per distinct pair — the
    # high-cardinality shuffle CLAUDE.md forbids — and a second shuffle).
    def dedup_orders(t: pa.Table) -> pa.Table:
        agg = t.group_by(["o_custkey", "o_orderdate"]).aggregate(
            [("o_orderkey", "max")])
        return pa.table({"o_custkey": agg["o_custkey"],
                         "o_orderdate": agg["o_orderdate"],
                         "o_orderkey": agg["o_orderkey_max"]})

    o = orders.map_batches(dedup_orders, batch_format="pyarrow")

    # co-group both sides by a HASHED user bucket (not per-user groups: at
    # N keys that is N python calls through map_groups; ~64 buckets keep the
    # shuffle and the per-group overhead bounded), then one vectorized
    # pd.merge_asof(by="k") per bucket handles every user in the bucket.
    N_BUCKETS = 64

    def tag_events(t: pa.Table) -> pa.Table:
        k = pc.cast(t["user_id"], pa.int64())
        return pa.table({"bucket": pc.bit_wise_and(k, N_BUCKETS - 1),
                         "k": k, "event_id": t["event_id"], "ts": t["ts"],
                         "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                         "side": pa.array(["e"] * t.num_rows)})

    def tag_orders(t: pa.Table) -> pa.Table:
        k = pc.cast(t["o_custkey"], pa.int64())
        return pa.table({"bucket": pc.bit_wise_and(k, N_BUCKETS - 1),
                         "k": k, "event_id": pa.nulls(t.num_rows, pa.int64()),
                         "ts": t["o_orderdate"], "o_orderkey": t["o_orderkey"],
                         "side": pa.array(["o"] * t.num_rows)})

    ev_tagged = events.map_batches(tag_events, batch_format="pyarrow")
    or_tagged = o.map_batches(tag_orders, batch_format="pyarrow")

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == "e"].sort_values(["ts", "event_id"])
        # finish the cross-batch dedup here (max orderkey per (k, ts)):
        # duplicate timestamps would make merge_asof's pick order-dependent
        od = (g.loc[g["side"] == "o", ["ts", "k", "o_orderkey"]]
               .groupby(["k", "ts"], as_index=False)["o_orderkey"].max()
               .sort_values("ts"))
        if len(ev) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "last_orderkey": pd.Series([], dtype="int64")})

        merged = pd.merge_asof(ev[["ts", "k", "event_id"]],
                               od[["ts", "k", "o_orderkey"]],
                               on="ts", by="k", direction="backward")
        # no-match sentinel -1 instead of NULL: DuckDB's fetchdf turns a
        # nullable BIGINT into float64, which can never hash-match an int64
        # Ray column — COALESCE on both sides keeps the dtype pure int64
        return pd.DataFrame({"event_id": merged["event_id"].astype("int64"),
                             "user_id": merged["k"].astype("int64"),
                             "last_orderkey": merged["o_orderkey"]
                             .fillna(-1).astype("int64")})

    return ev_tagged.union(or_tagged).groupby("bucket").map_groups(
        asof, batch_format="pandas")


Q_ASOF_SQL = """
SELECT e.event_id, e.user_id,
       CAST(COALESCE(o.o_orderkey, -1) AS BIGINT) AS last_orderkey
FROM events e
ASOF LEFT JOIN (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
) o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
"""


# ---------------------------------------------------------------------------
# JSON field extraction (§2.8 — serde field access in the reference) as a
# grouped aggregate: parse the props payload, pull one typed field, pre-agg
# ---------------------------------------------------------------------------

def q_json_extract(sf_dir: str):
    """Per-event-type stats of the JSON field ``props.k``.

    The reference reads JSON fields via serde everywhere (SURVEY.md §2.8,
    e.g. dsq-cli main.rs:680-685); the Ray form is a map_batches parse
    (CPython json — per-row by nature, like all string parsing here) into
    typed columns followed by the usual partial-agg → tiny groupby. Scale:
    the shuffle carries one row per (batch, event_type) only.
    """
    import json

    from ray.data.aggregate import Max, Min, Sum
    ds = read_table(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ks = np.fromiter((json.loads(p)["k"] for p in t["props"].to_pylist()),
                         dtype=np.int64, count=t.num_rows)
        tmp = pa.table({"event_type": t["event_type"], "k": pa.array(ks),
                        "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by("event_type").aggregate(
            [("k", "sum"), ("k", "min"), ("k", "max"), ("n", "sum")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("k_sum", alias_name="sum_k"),
                        Min("k_min", alias_name="min_k"),
                        Max("k_max", alias_name="max_k"),
                        Sum("n_sum", alias_name="n_events")))
    df = agg.to_pandas()
    df["avg_k"] = df["sum_k"].astype(np.float64) / \
        df["n_events"].astype(np.float64)
    return df


Q_JSON_EXTRACT_SQL = """
SELECT event_type,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# ROLLUP hierarchy (GROUPING SETS family): one distributed fine-level agg,
# coarser levels re-aggregated from it
# ---------------------------------------------------------------------------

def q_rollup_orders(sf_dir: str):
    """Order count/revenue by ROLLUP(year, month) with -1 sentinels.

    Scale shape: the only distributed work is the fine (year, month)
    partial-agg + ~84-group groupby; the year level and grand total are
    re-aggregations OF THAT BOUNDED RESULT on the driver (rollup levels
    are functions of the finest level — never a second pass over facts).
    Sentinel -1 instead of NULL keeps both engines' dtypes pure int64
    under the driver's hash gate.
    """
    from ray.data.aggregate import Sum
    ds = read_table(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tmp = pa.table({
            "year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            "month": pc.cast(pc.month(t["o_orderdate"]), pa.int64()),
            "cents": cents_arr(t["o_totalprice"]),
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by(["year", "month"]).aggregate(
            [("cents", "sum"), ("n", "sum")])

    fine = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["year", "month"])
              .aggregate(Sum("cents_sum", alias_name="revenue_cents"),
                         Sum("n_sum", alias_name="n_orders"))).to_pandas()
    years = (fine.groupby("year", as_index=False)
                 .agg(revenue_cents=("revenue_cents", "sum"),
                      n_orders=("n_orders", "sum")))
    years["month"] = np.int64(-1)
    total = pd.DataFrame({
        "year": [np.int64(-1)], "month": [np.int64(-1)],
        "revenue_cents": [np.int64(fine["revenue_cents"].sum())],
        "n_orders": [np.int64(fine["n_orders"].sum())]})
    out = pd.concat([fine, years, total], ignore_index=True)
    return out[["year", "month", "n_orders", "revenue_cents"]].astype(
        {"year": "int64", "month": "int64",
         "n_orders": "int64", "revenue_cents": "int64"})


Q_ROLLUP_SQL = """
WITH f AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT COALESCE(y, -1) AS year, COALESCE(m, -1) AS month,
       COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM f GROUP BY ROLLUP(y, m)
"""


def q_cube_orders(sf_dir: str):
    """Order count/revenue by CUBE(o_orderpriority, o_orderstatus) with
    'ALL' sentinels — completing the multi-level grouping family next to
    ROLLUP (which lacks the (·, status) cross level).

    Scale shape (the q_rollup_orders discipline): ONE distributed pass
    computes only the finest (priority, status) level — a per-batch
    partial-agg into a ≤15-group groupby — and all three coarser cube
    levels are re-aggregations OF THAT BOUNDED RESULT on the driver;
    facts are never re-scanned per level.
    """
    from ray.data.aggregate import Sum
    ds = read_table(sf_dir, "orders", ["o_orderpriority", "o_orderstatus",
                                       "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tmp = pa.table({
            "priority": t["o_orderpriority"],
            "status": t["o_orderstatus"],
            "cents": cents_arr(t["o_totalprice"]),
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by(["priority", "status"]).aggregate(
            [("cents", "sum"), ("n", "sum")])

    fine = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["priority", "status"])
              .aggregate(Sum("cents_sum", alias_name="revenue_cents"),
                         Sum("n_sum", alias_name="n_orders"))).to_pandas()

    def lvl(df, keys):
        g = (df.groupby(keys, as_index=False)
               .agg(revenue_cents=("revenue_cents", "sum"),
                    n_orders=("n_orders", "sum")))
        for col in ("priority", "status"):
            if col not in keys:
                g[col] = "ALL"
        return g

    total = pd.DataFrame({
        "priority": ["ALL"], "status": ["ALL"],
        "revenue_cents": [np.int64(fine["revenue_cents"].sum())],
        "n_orders": [np.int64(fine["n_orders"].sum())]})
    out = pd.concat([fine, lvl(fine, ["priority"]), lvl(fine, ["status"]),
                     total], ignore_index=True)
    return out[["priority", "status", "n_orders", "revenue_cents"]].astype(
        {"n_orders": "int64", "revenue_cents": "int64"})


Q_CUBE_SQL = """
WITH f AS (
  SELECT o_orderpriority AS p, o_orderstatus AS s,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT COALESCE(p, 'ALL') AS priority, COALESCE(s, 'ALL') AS status,
       COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM f GROUP BY CUBE(p, s)
"""


# ---------------------------------------------------------------------------
# pivot (conditional aggregation to a wide table): segment × order status
# ---------------------------------------------------------------------------

def q_pivot_status(sf_dir: str):
    """Orders pivoted to one row per customer segment with per-status
    count/revenue columns ('O'/'F'/'P' — the fixed TPC-H status domain).

    Broadcast join (J1 shape): the custkey→segment dimension probe rides
    inside the partial-agg map; the shuffle is 5 segments × per-batch rows.
    The pivot itself is conditional aggregation — wide columns, no extra
    pass, mirroring SQL FILTER/CASE aggregation.
    """
    from ray.data.aggregate import Sum
    cust = read_dim(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ckeys = cust["c_custkey"].to_numpy()
    order_idx = np.argsort(ckeys, kind="stable")
    ckeys_sorted = ckeys[order_idx]
    csegs = np.asarray(cust["c_mktsegment"].to_pylist(),
                       dtype=object)[order_idx]

    ds = read_table(sf_dir, "orders",
                    ["o_custkey", "o_orderstatus", "o_totalprice"])
    STATUSES = ("O", "F", "P")

    def partial(t: pa.Table) -> pa.Table:
        seg = probe_sorted(ckeys_sorted, csegs,
                           t["o_custkey"].to_numpy(zero_copy_only=False),
                           "NONE")
        status = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        cents = cents_arr(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        cols = {"c_mktsegment": pa.array(seg)}
        for s in STATUSES:
            m = status == s
            cols[f"n_{s}"] = pa.array(m.astype(np.int64))
            cols[f"rev_{s}_cents"] = pa.array(np.where(m, cents, 0))
        tmp = pa.table(cols)
        return tmp.group_by("c_mktsegment").aggregate(
            [(c, "sum") for c in cols if c != "c_mktsegment"])

    aggs = []
    for s in STATUSES:
        aggs.append(Sum(f"n_{s}_sum", alias_name=f"n_{s}"))
        aggs.append(Sum(f"rev_{s}_cents_sum", alias_name=f"rev_{s}_cents"))
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("c_mktsegment").aggregate(*aggs))


Q_PIVOT_SQL = """
SELECT c.c_mktsegment,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS rev_O_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS rev_F_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS rev_P_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# left outer join with null-fill (the one outer-join shape the catalogue
# lacked): nation ⟕ high-balance customer rollup
# ---------------------------------------------------------------------------

LEFT_JOIN_BAL = 9950.0


def q_left_join_nations(sf_dir: str):
    """Per-nation count/sum/avg of customers with acctbal > 9950, KEEPING
    nations with none (count 0, sum 0, avg 0.0) — LEFT OUTER semantics.

    Scale shape: facts are filtered + partially aggregated per batch by
    nationkey (25 groups); the outer join against the nation dimension is
    a driver-side merge of two bounded tables. The 9950 cut leaves at
    least one nation empty at every sf (sf0.001: 25, sf0.01: 19,
    sf0.1: 1), so the null-fill path is always exercised.
    """
    from ray.data.aggregate import Sum
    nat = read_dim(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()

    ds = read_table(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], pa.scalar(LEFT_JOIN_BAL)))
        tmp = pa.table({"c_nationkey": t["c_nationkey"],
                        "cents": cents_arr(t["c_acctbal"]),
                        "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        out = tmp.group_by("c_nationkey").aggregate(
            [("cents", "sum"), ("n", "sum")])
        if out.num_rows == 0:
            # empty-batch rule: emit the suffixed post-group schema
            return pa.table({"c_nationkey": pa.array([], pa.int64()),
                             "cents_sum": pa.array([], pa.int64()),
                             "n_sum": pa.array([], pa.int64())})
        return out

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("c_nationkey")
             .aggregate(Sum("cents_sum", alias_name="sum_acctbal_cents"),
                        Sum("n_sum", alias_name="n_customers"))).to_pandas()
    if "c_nationkey" not in agg.columns:
        # zero survivors anywhere: the grouped aggregate of an all-empty
        # stream drops its schema — rebuild it so the outer join still
        # yields the null-filled nation rows
        agg = pd.DataFrame({"c_nationkey": pd.Series([], dtype="int64"),
                            "sum_acctbal_cents": pd.Series([], dtype="int64"),
                            "n_customers": pd.Series([], dtype="int64")})
    m = nat.merge(agg, left_on="n_nationkey", right_on="c_nationkey",
                  how="left")
    n = m["n_customers"].fillna(0).astype("int64")
    s = m["sum_acctbal_cents"].fillna(0).astype("int64")
    avg = np.where(n.to_numpy() > 0,
                   s.to_numpy(dtype=np.float64)
                   / np.where(n.to_numpy() > 0, n.to_numpy(), 1).astype(np.float64),
                   0.0)
    return pd.DataFrame({"n_name": m["n_name"], "n_customers": n,
                         "sum_acctbal_cents": s,
                         "avg_acctbal_cents": avg})


Q_LEFT_JOIN_SQL = f"""
SELECT n.n_name,
       CAST(COALESCE(a.cnt, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(a.s, 0) AS BIGINT) AS sum_acctbal_cents,
       CASE WHEN COALESCE(a.cnt, 0) > 0
            THEN CAST(a.s AS DOUBLE) / CAST(a.cnt AS DOUBLE)
            ELSE 0.0e0 END AS avg_acctbal_cents
FROM nation n LEFT JOIN (
  SELECT c_nationkey, COUNT(*) AS cnt,
         SUM(CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT)) AS s
  FROM customer WHERE c_acctbal > {LEFT_JOIN_BAL}
  GROUP BY c_nationkey
) a ON n.n_nationkey = a.c_nationkey
"""


# ---------------------------------------------------------------------------
# NTILE window function (equal-frequency bucketing per partition)
# ---------------------------------------------------------------------------

def _ntile_of_rank(r: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE bucket of global rank r (1-based) among n rows: the first
    n%k buckets get ceil(n/k) rows, the rest floor(n/k) — vectorized."""
    base, rem = divmod(n, k)
    cut = rem * (base + 1)
    lead = (r - 1) // (base + 1) + 1
    tail = rem + (r - 1 - cut) // max(base, 1) + 1   # base=0 ⇒ branch unused
    return np.where(r <= cut, lead, tail).astype(np.int64)


def q_ntile_balance(sf_dir: str, order_bits: int = ORDER_BUCKET_BITS):
    """Quartile (NTILE(4)) of every customer's account balance within its
    market segment, deterministic under the (c_acctbal, c_custkey) order.

    Completes the window-function family (rank/row_number, LAG/gaps,
    running totals, percentiles already exist). Distributed rank, not a
    whole-segment sort: the two-phase shard-rank pattern of ``q_pack_bins``
    over order-preserving value buckets (``f64_order_bucket``) — phase 1
    pre-aggregates per-(segment, bucket) row counts, the driver
    prefix-sums them into bucket offsets (O(segments × non-empty buckets)
    rows), phase 2 co-groups each (segment, bucket), sorts locally by
    (c_acctbal, c_custkey) and adds the offset: local rank + offset is the
    exact global rank, which maps to the SQL NTILE bucket sizes
    (ceil-sized leading buckets). No task ever materializes more than one
    value-bucket of one segment.
    """
    import ray
    from ray.data.aggregate import Sum
    NT = 4
    ds = read_table(sf_dir, "customer",
                    ["c_custkey", "c_mktsegment", "c_acctbal"])

    def counts_partial(t: pa.Table) -> pa.Table:
        b = f64_order_bucket(t["c_acctbal"].to_numpy(zero_copy_only=False),
                             order_bits)
        tmp = pa.table({"c_mktsegment": t["c_mktsegment"],
                        "bucket": pa.array(b),
                        "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by(["c_mktsegment", "bucket"]).aggregate(
            [("n", "sum")])

    counts = (ds.map_batches(counts_partial, batch_format="pyarrow")
              .groupby(["c_mktsegment", "bucket"])
              .aggregate(Sum("n_sum", alias_name="n"))
              .to_pandas())

    offsets: dict = {}        # (segment, bucket) -> rows before this bucket
    totals: dict = {}
    for seg, g in counts.groupby("c_mktsegment"):
        g = g.sort_values("bucket")
        ns = g["n"].to_numpy(dtype=np.int64)
        cum = ns.cumsum()
        for bk, off in zip(g["bucket"].to_numpy(dtype=np.int64),
                           cum - ns):
            offsets[(seg, int(bk))] = int(off)
        totals[seg] = int(cum[-1])
    meta_ref = ray.put((offsets, totals))

    def tag(t: pa.Table) -> pa.Table:
        b = f64_order_bucket(t["c_acctbal"].to_numpy(zero_copy_only=False),
                             order_bits)
        return t.append_column("bucket", pa.array(b))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        offs, tot = ray.get(meta_ref)
        seg = g["c_mktsegment"].iloc[0]
        key = (seg, int(g["bucket"].iloc[0]))
        g = g.sort_values(["c_acctbal", "c_custkey"]).reset_index(drop=True)
        rank = np.arange(1, len(g) + 1, dtype=np.int64) + offs[key]
        return pd.DataFrame({
            "c_custkey": g["c_custkey"].astype("int64"),
            "c_mktsegment": g["c_mktsegment"],
            "quartile": _ntile_of_rank(rank, tot[seg], NT)})

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby(["c_mktsegment", "bucket"])
              .map_groups(assign, batch_format="pandas")
              .select_columns(["c_custkey", "c_mktsegment", "quartile"]))


Q_NTILE_SQL = """
SELECT c_custkey, c_mktsegment,
       CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal, c_custkey) AS BIGINT)
         AS quartile
FROM customer
"""


def q_rank_orders(sf_dir: str, order_bits: int = ORDER_BUCKET_BITS):
    """RANK() and DENSE_RANK() of every order's total price within its
    priority class — the tie-aware window functions, distributed.

    Two-phase order-bucket rank (same primitive as q_ntile_balance /
    q_value_percentiles): equal values always share an ``f64_order_bucket``,
    so tie groups never straddle a bucket boundary and both rank variants
    are exactly local-rank + bucket offset. Phase 1 pre-aggregates
    per-batch (priority, bucket, value, n) rows and reduces each bucket to
    (n_rows, n_distinct); the driver prefix-sums those into row- and
    distinct-space offsets (O(priorities × non-empty buckets) rows).
    Phase 2 co-groups each (priority, bucket) and ranks locally against
    the offsets. No task ever holds more than one value-bucket of one
    priority class.
    """
    import ray
    ds = read_table(sf_dir, "orders",
                    ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def counts_partial(t: pa.Table) -> pa.Table:
        b = f64_order_bucket(t["o_totalprice"].to_numpy(zero_copy_only=False),
                             order_bits)
        tmp = pa.table({"o_orderpriority": t["o_orderpriority"],
                        "bucket": pa.array(b),
                        "v": t["o_totalprice"],
                        "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})
        return tmp.group_by(["o_orderpriority", "bucket", "v"]).aggregate(
            [("n", "sum")])

    def bucket_summary(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "bucket": [np.int64(g["bucket"].iloc[0])],
            "n_rows": [np.int64(g["n_sum"].sum())],
            "n_distinct": [np.int64(g["v"].nunique())]})

    counts = (ds.map_batches(counts_partial, batch_format="pyarrow")
                .groupby(["o_orderpriority", "bucket"])
                .map_groups(bucket_summary, batch_format="pandas")
                .to_pandas())

    row_off: dict = {}
    dist_off: dict = {}
    for pri, g in counts.groupby("o_orderpriority"):
        g = g.sort_values("bucket")
        rows_cum = g["n_rows"].to_numpy(dtype=np.int64).cumsum()
        dist_cum = g["n_distinct"].to_numpy(dtype=np.int64).cumsum()
        for bk, ro, do in zip(g["bucket"].to_numpy(dtype=np.int64),
                              rows_cum - g["n_rows"].to_numpy(dtype=np.int64),
                              dist_cum - g["n_distinct"].to_numpy(dtype=np.int64)):
            row_off[(pri, int(bk))] = int(ro)
            dist_off[(pri, int(bk))] = int(do)
    off_ref = ray.put((row_off, dist_off))

    def tag(t: pa.Table) -> pa.Table:
        b = f64_order_bucket(t["o_totalprice"].to_numpy(zero_copy_only=False),
                             order_bits)
        return t.append_column("bucket", pa.array(b))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        ro, do = ray.get(off_ref)
        key = (g["o_orderpriority"].iloc[0], int(g["bucket"].iloc[0]))
        v = g["o_totalprice"].to_numpy(dtype=np.float64)
        order = np.argsort(v, kind="stable")
        sv = v[order]
        # min-rank within tie runs = index of each run start (searchsorted
        # left); dense rank = run ordinal
        starts = np.searchsorted(sv, sv, side="left")
        new_run = np.concatenate([[True], sv[1:] != sv[:-1]])
        dense_sorted = np.cumsum(new_run)
        rank = np.empty(len(v), dtype=np.int64)
        dense = np.empty(len(v), dtype=np.int64)
        rank[order] = starts + 1 + ro[key]
        dense[order] = dense_sorted + do[key]
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].astype("int64"),
            "o_orderpriority": g["o_orderpriority"],
            "o_totalprice": v,
            "price_rank": rank,
            "price_dense_rank": dense})

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby(["o_orderpriority", "bucket"])
              .map_groups(assign, batch_format="pandas")
              .select_columns(["o_orderkey", "o_orderpriority",
                               "o_totalprice", "price_rank",
                               "price_dense_rank"]))


Q_RANK_ORDERS_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(RANK() OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice) AS BIGINT) AS price_rank,
       CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice) AS BIGINT)
         AS price_dense_rank
FROM orders
"""


HEAVY_USER_MIN_EVENTS = 15
_HU_A, _HU_B = "purchase", "error"


def q_heavy_user_sets(sf_dir: str):
    """INTERSECT / EXCEPT over derived key sets: users with ≥15 purchases
    (A) vs users with ≥15 errors (B), labeled both / a_only / b_only —
    completing the set-ops family next to q_union_distinct.

    One pass: per-batch (user_id, p_n, e_n) count pre-agg, then 64 hash
    shards co-group (bounded group count; per-group size = users/64, the
    q_union_distinct sharded-distinct shape) and compute membership from
    exact int64 totals. No per-set passes, no high-cardinality groupby.
    """
    ds = read_table(sf_dir, "events", ["user_id", "event_type"])
    N_SHARDS = 64

    def partial(t: pa.Table) -> pa.Table:
        # vectorized count pre-agg: mask to the two event types, then one
        # np.unique with return_counts over (user_id, is_error) pairs
        mask = pc.is_in(t["event_type"], value_set=pa.array([_HU_A, _HU_B]))
        sub = t.filter(mask)
        users = sub["user_id"].to_numpy(zero_copy_only=False)
        is_b = pc.equal(sub["event_type"], _HU_B).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(users) == 0:
            empty = np.array([], dtype=np.int64)
            return pa.table({"user_id": pa.array(empty),
                             "shard": pa.array(empty),
                             "p_n": pa.array(empty),
                             "e_n": pa.array(empty)})
        pairs, counts = np.unique(
            np.stack([users.astype(np.int64), is_b], axis=1),
            axis=0, return_counts=True)
        uids = np.unique(pairs[:, 0])
        p_n = np.zeros(len(uids), dtype=np.int64)
        e_n = np.zeros(len(uids), dtype=np.int64)
        idx = np.searchsorted(uids, pairs[:, 0])
        np.add.at(p_n, idx[pairs[:, 1] == 0], counts[pairs[:, 1] == 0])
        np.add.at(e_n, idx[pairs[:, 1] == 1], counts[pairs[:, 1] == 1])
        return pa.table({
            "user_id": pa.array(uids),
            "shard": pa.array(uids & (N_SHARDS - 1)),
            "p_n": pa.array(p_n),
            "e_n": pa.array(e_n),
        })

    def label(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id")[["p_n", "e_n"]].sum()
        in_a = s["p_n"] >= HEAVY_USER_MIN_EVENTS
        in_b = s["e_n"] >= HEAVY_USER_MIN_EVENTS
        s = s[in_a | in_b]
        in_a, in_b = in_a[s.index], in_b[s.index]
        lab = np.where(in_a & in_b, "both",
                       np.where(in_a, "a_only", "b_only"))
        return pd.DataFrame({
            "user_id": s.index.to_numpy(dtype=np.int64),
            "in_a": in_a.to_numpy().astype(np.int64),
            "in_b": in_b.to_numpy().astype(np.int64),
            "set_label": lab,
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("shard")
              .map_groups(label, batch_format="pandas")
              .select_columns(["user_id", "in_a", "in_b", "set_label"]))


Q_HEAVY_USER_SETS_SQL = f"""
WITH a AS (
  SELECT user_id FROM events WHERE event_type = '{_HU_A}'
  GROUP BY user_id HAVING COUNT(*) >= {HEAVY_USER_MIN_EVENTS}
), b AS (
  SELECT user_id FROM events WHERE event_type = '{_HU_B}'
  GROUP BY user_id HAVING COUNT(*) >= {HEAVY_USER_MIN_EVENTS}
)
SELECT user_id, CAST(1 AS BIGINT) AS in_a, CAST(1 AS BIGINT) AS in_b,
       'both' AS set_label
FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)
UNION ALL
SELECT user_id, CAST(1 AS BIGINT), CAST(0 AS BIGINT), 'a_only'
FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)
UNION ALL
SELECT user_id, CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'b_only'
FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM a)
"""
