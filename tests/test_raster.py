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


def _dense_text(n_lines: int = 10, width: int = 190) -> str:
    # seeded non-repetitive words: repetitive filler would trip the decoder's
    # (faithful) no_repeat_ngram_size=20 ban and corrupt the comparison
    rng = np.random.default_rng(7)
    lines = []
    for _ in range(n_lines):
        chars = []
        while len(chars) < width:
            wl = int(rng.integers(2, 8))
            chars.extend(R.CHARSET[int(rng.integers(26))] for _ in range(wl))
            chars.append(" ")
        lines.append("".join(chars[:width]).rstrip())
    return "\n".join(lines)


def test_tiled_sampling_matches_materialized_resize():
    """sample_patterns_tiled == full resize_bicubic to tile*grid + nearest
    sampling of glyph-pixel centers (the two-implementation parity style)."""
    from deepseek_ocr_rs_ray.functions.imageops import best_grid, resize_bicubic
    img = R.render_text_image(_dense_text(4), 2)
    h, w = img.shape[:2]
    params = TilingParams.ocr1()
    grid = best_grid(w, h, params)
    tw, th = params.tile_size * grid[0], params.tile_size * grid[1]
    rows, cols = R.grid_shape(w, h, 2, R.DEFAULT_MARGIN)
    pt = R.sample_patterns_tiled(img, params.tile_size, grid, 2,
                                 R.DEFAULT_MARGIN, rows, cols)

    resized = resize_bicubic(img, tw, th)
    m = R.DEFAULT_MARGIN
    for r in range(0, rows, max(rows // 3, 1)):
        for c in range(0, cols, max(cols // 7, 1)):
            for gy in range(R.GLYPH_H):
                for gx in range(R.GLYPH_W):
                    sx = ((m + c * R.CELL_W + gx) + 0.5) * 2
                    sy = ((m + r * R.CELL_H + gy) + 0.5) * 2
                    cx = min(max(int(sx * (tw / w)), 0), tw - 1)
                    cy = min(max(int(sy * (th / h)), 0), th - 1)
                    assert pt[r, c, gy, gx] == (resized[cy, cx, 0] < 128)


def test_dense_page_decodes_only_via_tiles():
    """M5 end-to-end: a dense wide scan out-resolves the 1024px global view
    (glyph_scale*scale < 1); the tile-sourced decode recovers the text
    exactly while global-view patterns misclassify glyphs."""
    text = _dense_text()
    img = R.render_text_image(text, 2)
    h, w = img.shape[:2]
    assert w > 2048   # forces glyph_scale * scale < 1 at base_size 1024
    payload = R.encode_payload(img, 2, R.DEFAULT_MARGIN)
    decoded, n_tiles, _ = ocr_decode_page(
        payload, VisionSettings(), TilingParams.ocr1(),
        DecodeParameters(max_new_tokens=4096))   # 10 × 191 tokens
    assert n_tiles > 0
    assert [l.rstrip() for l in decoded.splitlines()] == text.splitlines()

    # the global view alone misreads at least one inked glyph
    rows, cols = R.grid_shape(w, h, 2, R.DEFAULT_MARGIN)
    pg = R.sample_patterns_direct(img, 1024, 2, R.DEFAULT_MARGIN, rows, cols)
    lg = R.all_cell_logits(pg)
    masked = lg.copy()
    masked[:, :, R.EOS_ID] = np.float32(-1000.0)
    pred = masked.reshape(rows * cols, -1).argmax(axis=1)
    first_line = "".join(R.VOCAB[t] for t in pred[:cols]).rstrip()
    assert first_line != text.splitlines()[0]
