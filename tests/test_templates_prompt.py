"""Conversation templates (M1/A7), prompt tokenization + placeholder math
(M11), image-token injection (J2), smart_resize (M8), patchify (M9/M10)."""

import numpy as np
import pytest

from deepseek_ocr_rs_ray.functions import imageops as I
from deepseek_ocr_rs_ray.functions import prompt as P
from deepseek_ocr_rs_ray.functions import templates as TPL


def test_render_prompt_deepseek():
    out = TPL.render_prompt("deepseek", "You are an OCR model.", "Read this. <image>")
    # system + sep, user turn + sep (idx 0 → sep), empty assistant → "role:"
    assert out == ("You are an OCR model.\n\n"
                   "User: Read this. <image>\n\n"
                   "Assistant:")


def test_render_prompt_empty_system():
    out = TPL.render_prompt("deepseek", "", "hi")
    assert out == "User: hi\n\nAssistant:"


def test_sep_alternation_and_trim():
    t = TPL.get_conv_template("deepseek")
    t.append_message("User", "  q1  ")      # trimmed
    t.append_message("Assistant", "a1")     # idx 1 → sep2 (eos sentinel)
    t.append_message("User", "   ")         # whitespace-only → "User:"
    assert t.get_prompt() == ("User: q1\n\n"
                              "Assistant: a1" + TPL.EOS_SENTINEL +
                              "User:")


def test_plain_and_alignment_styles():
    p = TPL.get_conv_template("plain")
    p.append_message("", "a")
    p.append_message("", "b")
    assert p.get_prompt() == "ab"
    a = TPL.get_conv_template("alignment")
    a.append_message("", "ignored")   # even idx → <image>\n
    a.append_message("", "answer")
    assert a.get_prompt() == "<image>\nanswer"


def test_registry_duplicate_guard():
    t = TPL.ConversationTemplate(name="custom-x")
    TPL.register_conv_template(t)
    with pytest.raises(ValueError):
        TPL.register_conv_template(TPL.ConversationTemplate(name="custom-x"))
    TPL.register_conv_template(TPL.ConversationTemplate(name="custom-x"),
                               override_existing=True)
    # registry hands out copies, not aliases
    g = TPL.get_conv_template("deepseek")
    g.append_message("User", "side effect")
    assert TPL.get_conv_template("deepseek").messages == []


def test_num_queries_and_placeholder_counts():
    # base 1024: grid 64, ceil(64/4)=16; image 640: grid 40, ceil(40/4)=10
    assert P.num_queries(1024) == 16
    assert P.num_queries(640) == 10
    # global only (1,1 crop): OCR1 rows*(cols+1)+1 = 16*17+1 = 273
    ph = P.build_image_placeholders(9, (1, 1), 1024, 640, True, P.OCR1)
    assert len(ph) == 16 * 17 + 1
    # 2x1 tiles: local 10*2=20 cols, 10*1 rows → 10*(20+1) + global 273
    ph2 = P.build_image_placeholders(9, (2, 1), 1024, 640, True, P.OCR1)
    assert len(ph2) == 10 * (10 * 2 + 1) + 16 * 17 + 1
    # OCR2 flat: local 10*2*10 + global 16*16+1
    ph3 = P.build_image_placeholders(9, (2, 1), 1024, 640, True, P.OCR2)
    assert len(ph3) == 200 + 257
    # no crop mode: image_size grid only
    ph4 = P.build_image_placeholders(9, None, 1024, 640, False, P.OCR1)
    assert len(ph4) == 10 * 11 + 1


def test_build_prompt_tokens_and_mask():
    v = P.Vocab()
    tokens, mask = P.build_prompt_tokens(
        v, "read <image> carefully", [(1, 1)], 1024, 640, True)
    assert tokens[0] == P.BOS_ID and mask[0] == 0
    assert mask.sum() == 16 * 17 + 1
    assert len(tokens) == len(mask)
    # placeholder run is contiguous and uses the image token id
    img_positions = np.flatnonzero(mask)
    assert (tokens[img_positions] == v.image_token_id).all()
    with pytest.raises(ValueError):
        P.build_prompt_tokens(v, "no slots", [(1, 1)], 1024, 640, True)


def test_inject_image_tokens_scatter():
    rng = np.random.default_rng(3)
    text = rng.standard_normal((10, 4)).astype(np.float32)
    mask = np.array([0, 1, 1, 0, 0, 1, 0, 0, 0, 0], dtype=np.uint8)
    vision = np.full((3, 4), 7.0, dtype=np.float32)
    out = P.inject_image_tokens(text, vision, mask)
    assert (out[mask.astype(bool)] == 7.0).all()
    assert np.array_equal(out[~mask.astype(bool)], text[~mask.astype(bool)])
    with pytest.raises(ValueError):
        P.inject_image_tokens(text, vision[:2], mask)


def test_smart_resize_vectors():
    # simple multiple-of-factor rounding
    assert I.smart_resize(100, 200, 28, 56 * 56, 14 * 14 * 4 * 1280) == (112, 196)
    # area clamp downward: beta scaling then floor to factor
    h, w = I.smart_resize(4000, 4000, 28, 3136, 1000000)
    assert h % 28 == 0 and w % 28 == 0 and h * w <= 1000000
    # area clamp upward: ceil to factor
    h, w = I.smart_resize(30, 30, 28, 3136, 1000000)
    assert h % 28 == 0 and w % 28 == 0 and h * w >= 3136
    # tiny dimension upscaled to factor first
    h, w = I.smart_resize(5, 500, 28, 1, 10 ** 9)
    assert h >= 28
    with pytest.raises(ValueError):
        I.smart_resize(10, 5000, 28, 1, 10 ** 9)  # aspect > 200


def test_patchify_row_major_matches_naive():
    rng = np.random.default_rng(5)
    data = rng.standard_normal((8, 12, 3)).astype(np.float32)
    patch = 4
    got = I.patchify_row_major(data, patch)
    # naive loop port of preprocess.rs:178-205
    want = []
    for gh in range(2):
        for gw in range(3):
            for c in range(3):
                for py in range(patch):
                    for px in range(patch):
                        want.append(data[gh * patch + py, gw * patch + px, c])
    assert np.array_equal(got.reshape(-1), np.array(want, dtype=np.float32))


def test_patchify_merge_blocks_matches_naive():
    rng = np.random.default_rng(6)
    data = rng.standard_normal((8, 8, 3)).astype(np.float32)
    patch, merge = 2, 2
    got = I.patchify_merge_blocks(data, patch, merge)
    want = []
    for bh in range(2):
        for bw in range(2):
            for ih in range(merge):
                for iw in range(merge):
                    gh, gw = bh * merge + ih, bw * merge + iw
                    for c in range(3):
                        for py in range(patch):
                            for px in range(patch):
                                want.append(data[gh * patch + py, gw * patch + px, c])
    assert np.array_equal(got.reshape(-1), np.array(want, dtype=np.float32))


def test_position_metadata():
    pos, hh, ww = I.position_metadata((2, 2, 3))
    assert pos.tolist() == [0, 1, 2, 3, 4, 5] * 2
    assert hh.tolist() == [0, 0, 0, 1, 1, 1] * 2
    assert ww.tolist() == [0, 1, 2, 0, 1, 2] * 2


def test_tile_temporal():
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    assert np.array_equal(I.tile_temporal(x, 1), x)
    assert I.tile_temporal(x, 3).shape == (6, 3)
