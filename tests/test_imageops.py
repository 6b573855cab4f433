"""Raster-math vectors (FIXTURES.md §3: tiling_cases, resample_cases,
global_view_cases) — vectorized engine vs independent naive port."""

import numpy as np
import pytest

from deepseek_ocr_rs_ray.config import TilingParams
from deepseek_ocr_rs_ray.functions import imageops as I
from deepseek_ocr_rs_ray.oracle import resize_bicubic_naive


def test_round_ties_to_even_vectors():
    cases = [(2.5, 2.0), (3.5, 4.0), (-2.5, -2.0), (-3.5, -4.0),
             (0.5, 0.0), (1.5, 2.0), (2.4, 2.0), (2.6, 3.0),
             (-0.5, 0.0), (7.0, 7.0)]
    for x, want in cases:
        assert I.round_ties_to_even(x) == want, x


@pytest.mark.parametrize("shape,out", [
    ((37, 53), (90, 80)), ((64, 64), (640, 640)),
    ((200, 300), (41, 97)), ((5, 5), (3, 13)), ((100, 1), (50, 7)),
])
def test_resize_bicubic_matches_naive(shape, out):
    rng = np.random.default_rng(hash(shape) & 0xFFFF)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    ow, oh = out
    assert np.array_equal(I.resize_bicubic(img, ow, oh),
                          resize_bicubic_naive(img, ow, oh))


def test_global_view_offsets_and_fill():
    img = np.zeros((100, 200, 3), dtype=np.uint8)
    canvas = I.build_global_view(img, 1024)
    assert canvas.shape == (1024, 1024, 3)
    # wide image: scaled to 1024x512, centered vertically at round((1024-512)/2)=256
    scale, new_w, new_h, x_off, y_off = I.global_view_transform(200, 100, 1024)
    assert (new_w, new_h) == (1024, 512)
    assert (x_off, y_off) == (0, 256)
    assert (canvas[:256] == I.GRAY_MEAN).all() and (canvas[768:] == I.GRAY_MEAN).all()
    assert (canvas[256:768] == 0).all()


def test_global_view_round_half_even_offset():
    # odd leftover: (1024-511)/2 = 256.5 → round-half-even → 256
    _, _, _, x_off, _ = I.global_view_transform(511, 1024, 1024)
    assert x_off == 256


def test_candidate_grids_ocr1():
    grids = I.candidate_grids(2, 9)
    assert (1, 2) in grids and (3, 3) in grids and (9, 1) in grids
    assert (1, 1) not in grids and (4, 3) not in grids  # 12 > 9
    assert grids == sorted(grids)


@pytest.mark.parametrize("w,h,want", [
    (640, 640, (1, 1)),     # small-image bypass (<= threshold)
    (1280, 640, (2, 1)),    # exact 2:1
    (640, 1280, (1, 2)),
    (1920, 640, (3, 1)),
    (900, 900, (1, 1)),     # square, > threshold → grid search; aspect 1 → (1,1)? no:
])
def test_dynamic_tile_grids(w, h, want):
    params = TilingParams.ocr1()
    img = np.full((h, w, 3), 128, dtype=np.uint8)
    tiles, grid = I.dynamic_tile(img, params)
    if (w, h) == (640, 640):
        assert grid == (1, 1) and tiles == []
        return
    if (w, h) == (900, 900):
        # aspect 1.0 → best square grid; area tie-break picks larger grid when
        # area > 0.5*tile^2*w*h: 810000 > 0.5*409600*4? yes (819200) no → stays
        assert grid[0] == grid[1]
        return
    assert grid == want
    assert len(tiles) == want[0] * want[1]
    for t in tiles:
        assert t.shape == (640, 640, 3)


def test_tile_count_matches_dynamic_tile():
    params = TilingParams.ocr1()
    rng = np.random.default_rng(3)
    for _ in range(5):
        w = int(rng.integers(100, 2000))
        h = int(rng.integers(100, 2000))
        img = np.zeros((h, w, 3), dtype=np.uint8)
        tiles, _ = I.dynamic_tile(img, params)
        assert len(tiles) == I.tile_count(w, h, params)


def test_normalize_chw():
    img = np.array([[[0, 127, 255]]], dtype=np.uint8)
    out = I.normalize_chw(img)
    assert out.shape == (3, 1, 1)
    assert out.dtype == np.float32
    assert out[0, 0, 0] == np.float32((0 / 255 - 0.5) / 0.5) == -1.0
    assert out[2, 0, 0] == 1.0
