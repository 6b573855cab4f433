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
