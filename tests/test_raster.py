"""Raster payload codec + glyph model + OCR decode determinism/accuracy."""

import numpy as np

from deepseek_ocr_rs_ray.config import DecodeParameters, TilingParams, VisionSettings
from deepseek_ocr_rs_ray.functions import raster as R
from deepseek_ocr_rs_ray.functions.extract_row import ocr_decode_page
from deepseek_ocr_rs_ray.functions.imageops import build_global_view


def test_payload_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    data = R.encode_payload(img, 3, 2)
    out, scale, margin = R.decode_payload(data)
    assert np.array_equal(out, img) and scale == 3 and margin == 2
    meta = R.payload_meta(data)
    assert meta["width"] == 47 and meta["height"] == 33 and meta["glyph_scale"] == 3


def test_font_distinct():
    flat = R.FONT.reshape(len(R.CHARSET), -1)
    for i in range(len(flat)):
        for j in range(i + 1, len(flat)):
            assert (flat[i] != flat[j]).sum() >= 8


def test_vectorized_sampling_matches_scalar():
    img = R.render_text_image("ABC DEF\n123 XYZ", 4)
    h, w = img.shape[:2]
    canvas = build_global_view(img, 1024)
    rows, cols = R.grid_shape(w, h, 4, R.DEFAULT_MARGIN)
    pv = R.sample_all_patterns(canvas, w, h, 1024, 4, R.DEFAULT_MARGIN, rows, cols)
    lv = R.all_cell_logits(pv)
    for r in range(rows):
        for c in range(cols):
            ps = R.sample_cell_pattern(canvas, w, h, 1024, 4, R.DEFAULT_MARGIN, r, c)
            assert np.array_equal(pv[r, c], ps)
            assert np.array_equal(lv[r, c], R.cell_logits(ps))


def test_ocr_decode_recovers_clean_text():
    text = "HELLO WORLD\nRAY DATA 2026"
    img = R.render_text_image(text, 4)
    payload = R.encode_payload(img, 4, R.DEFAULT_MARGIN)
    decoded, n_tiles, n_tokens = ocr_decode_page(
        payload, VisionSettings(), TilingParams.ocr1(), DecodeParameters())
    # clean upscale → exact recovery (shorter lines are padded to the glyph
    # grid width with space tokens — blank cells decode as spaces)
    assert [l.rstrip() for l in decoded.splitlines()] == text.splitlines()
    assert n_tiles == 0             # small image bypass (<640px)


def test_ocr_decode_deterministic_across_calls():
    img = R.render_text_image("REPEATABLE OUTPUT 42\n" * 4, 2)
    payload = R.encode_payload(img, 2, R.DEFAULT_MARGIN)
    args = (payload, VisionSettings(), TilingParams.ocr1(), DecodeParameters())
    assert ocr_decode_page(*args) == ocr_decode_page(*args)


def test_ocr_decode_tiles_for_large_page():
    # wide page > 640px in x → dynamic tiling kicks in
    text = "\n".join("THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG 0123456789"
                     for _ in range(6))
    img = R.render_text_image(text, 4)
    assert img.shape[1] > 640
    payload = R.encode_payload(img, 4, R.DEFAULT_MARGIN)
    decoded, n_tiles, _ = ocr_decode_page(
        payload, VisionSettings(), TilingParams.ocr1(), DecodeParameters())
    assert n_tiles > 0
    assert decoded.splitlines()[0].startswith("THE QUICK")


def test_max_new_tokens_truncates():
    text = "\n".join("A" * 40 for _ in range(20))  # 20*41 > 512 steps
    img = R.render_text_image(text, 3)
    payload = R.encode_payload(img, 3, R.DEFAULT_MARGIN)
    decoded, _, n_tokens = ocr_decode_page(
        payload, VisionSettings(), TilingParams.ocr1(),
        DecodeParameters(max_new_tokens=100))
    assert n_tokens <= 100
