"""Fixture generator determinism: per-row pure function of (seed, i);
Ray-parallel sharded generation produces the same bytes as driver-side."""

import glob
import shutil

import pyarrow.parquet as pq

from deepseek_ocr_rs_ray.fixtures.pages import (
    gen_page, generate_pages_parquet, is_ocr_row, pages_table)


def test_gen_page_deterministic():
    a, b = gen_page(17), gen_page(17)
    assert a == b
    assert gen_page(17, seed=43) != a


def test_routing_rate():
    urls = [gen_page(i)["url"] for i in range(0, 2000, 10)]
    frac = sum(is_ocr_row(u) for u in urls) / len(urls)
    assert 0.02 < frac < 0.09   # ≈5 %


def test_ray_parallel_generation_matches_driver(ray_session, tmp_path):
    out = str(tmp_path / "pages")
    generate_pages_parquet(out, 60, rows_per_shard=20, parallel=True)
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) == 3
    got = pq.read_table(files)  # concatenated in file order = index order
    want = pages_table(60)
    assert got.equals(want)


def test_marker_makes_generation_idempotent(tmp_path):
    out = str(tmp_path / "pages2")
    generate_pages_parquet(out, 10, rows_per_shard=5, parallel=False)
    before = sorted(glob.glob(out + "/*"))
    generate_pages_parquet(out, 10, rows_per_shard=5, parallel=False)
    assert sorted(glob.glob(out + "/*")) == before


def test_size_skew_present():
    sizes = [len(gen_page(i)["html"]) for i in range(150)]
    assert max(sizes) > 10 * min(sizes)  # log-normal spread
