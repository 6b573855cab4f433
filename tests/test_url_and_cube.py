"""URL normalization kernels (functions/urltools.py) and the CUBE
grouping op — unit coverage next to their driver-gate entries."""

import pandas as pd
import pytest

from deepseek_ocr_rs_ray.functions.urltools import parse_url, registered_domain

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("url,expect", [
    ("http://www.Site1.COM:8080/a/b?q=1",
     {"scheme": "http", "host": "www.site1.com", "port": 8080,
      "registered_domain": "site1.com", "path_depth": 2, "has_query": 1}),
    ("https://a.b.c.site2.co.uk/x",
     {"scheme": "https", "host": "a.b.c.site2.co.uk", "port": -1,
      "registered_domain": "site2.co.uk", "path_depth": 1,
      "has_query": 0}),
    ("http://192.168.0.7/",
     {"scheme": "http", "host": "192.168.0.7", "port": -1,
      "registered_domain": "192.168.0.7", "path_depth": 0,
      "has_query": 0}),
    ("https://localhost", {"scheme": "https", "host": "localhost",
                           "port": -1, "registered_domain": "localhost",
                           "path_depth": 0, "has_query": 0}),
])
def test_parse_url(url, expect):
    assert parse_url(url) == expect


def test_parse_url_rejects():
    for bad in ("not a url", "/relative/only", "http://", "mailto:x@y"):
        with pytest.raises(ValueError):
            parse_url(bad)


def test_registered_domain_rules():
    assert registered_domain("x.y.example.com") == "example.com"
    assert registered_domain("example.co.uk") == "example.co.uk"
    assert registered_domain("www.example.com.au") == "example.com.au"
    assert registered_domain("example.io") == "example.io"
    assert registered_domain("10.0.0.1") == "10.0.0.1"


def test_cube_levels_consistent(ray_session):
    """Every coarser cube level must equal the sum of its finer rows."""
    from deepseek_ocr_rs_ray.pipelines.relational import q_cube_orders
    df = q_cube_orders(SF)
    fine = df[(df.priority != "ALL") & (df.status != "ALL")]
    total = df[(df.priority == "ALL") & (df.status == "ALL")]
    assert len(total) == 1
    assert total["n_orders"].iloc[0] == fine["n_orders"].sum()
    by_p = df[(df.priority != "ALL") & (df.status == "ALL")]
    for _, r in by_p.iterrows():
        sub = fine[fine.priority == r.priority]
        assert r.n_orders == sub["n_orders"].sum()
        assert r.revenue_cents == sub["revenue_cents"].sum()
    by_s = df[(df.priority == "ALL") & (df.status != "ALL")]
    assert by_s["n_orders"].sum() == total["n_orders"].iloc[0]


def test_domain_cap_semantics(ray_session):
    """Every domain keeps at most DOMAIN_CAP rows, ranks are 1..k, and
    the survivor set is deterministic across executions."""
    from deepseek_ocr_rs_ray.pipelines.corpus import DOMAIN_CAP, q_domain_cap

    def canon(ds):
        return (ds.to_pandas().sort_values(["registered_domain", "rk"])
                .reset_index(drop=True))

    a = canon(q_domain_cap(SF))
    b = canon(q_domain_cap(SF))
    pd.testing.assert_frame_equal(a, b)
    sizes = a.groupby("registered_domain")["rk"].agg(["count", "max"])
    assert (sizes["count"] <= DOMAIN_CAP).all()
    assert (sizes["count"] == sizes["max"]).all()   # ranks are 1..k
    assert len(a) > 0
