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
