"""Strict-gate helpers, DOM robustness fuzzing, OCR accuracy sanity,
config-merge layering (J5)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from deepseek_ocr_rs_ray.config import DecodeParameters, DomParams, merge
from deepseek_ocr_rs_ray.functions.conformance import (
    diff_report, earliest_divergence, strict_compare_rows)
from deepseek_ocr_rs_ray.functions.dom import extract_dom


def test_earliest_divergence():
    assert earliest_divergence("abc", "abc") is None
    assert earliest_divergence("abc", "abd") == 2
    assert earliest_divergence("abc", "ab") == 2
    assert earliest_divergence("", "x") == 0
    assert earliest_divergence([1, 2], [1, 2, 3]) == 2


def test_diff_report_and_rollup():
    assert diff_report("u", "same", "same") is None
    r = diff_report("u", "aXc", "abc")
    assert "diverges at char 1" in r
    n, reports = strict_compare_rows(["a", "b"], ["x", "ok"], ["y", "ok"])
    assert n == 1 and "a" in reports[0]


# --- DOM fuzz: arbitrary byte soup must never crash, always deterministic --

_tag_bits = st.sampled_from(["<div>", "</div>", "<p>", "</p>", "<a href='x'>",
                             "</a>", "<nav>", "</nav>", "<img/>", "<!-- c -->",
                             "<", ">", "</", "<![CDATA[z]]>", "<script>",
                             "</script>", "&amp;", "&#xx;"])
_text_bits = st.text(max_size=40)


@given(st.lists(st.one_of(_tag_bits, _text_bits), max_size=30))
@settings(max_examples=300, deadline=None)
def test_dom_fuzz_html_fragments(parts):
    html = "".join(parts).encode("utf-8", errors="ignore")
    r1 = extract_dom(html)
    r2 = extract_dom(html)
    assert r1["text"] == r2["text"] and r1["spans"] == r2["spans"]
    # spans always slice to valid UTF-8 within bounds
    for s, e in r1["spans"]:
        assert 0 <= s <= e <= len(html)
        html[s:e].decode("utf-8")


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_dom_fuzz_raw_bytes(data):
    r = extract_dom(data)
    assert isinstance(r["text"], str)
    for s, e in r["spans"]:
        assert 0 <= s <= e <= len(data)


# --- OCR accuracy sanity: the decode is meaningful, not just deterministic --

def test_ocr_glyph_accuracy_at_safe_scales():
    from deepseek_ocr_rs_ray.config import TilingParams, VisionSettings
    from deepseek_ocr_rs_ray.functions.extract_row import ocr_decode_page
    from deepseek_ocr_rs_ray.functions.raster import (
        CHARSET, DEFAULT_MARGIN, encode_payload, render_text_image)
    rng = np.random.default_rng(99)
    total = correct = 0
    for _ in range(6):
        # first char always inked: normalize_text trims document-leading
        # whitespace, which would misalign a char-wise comparison
        lines = [CHARSET[int(rng.integers(26))] +
                 "".join(CHARSET[int(rng.integers(26))] if rng.random() > 0.2
                         else " " for _ in range(int(rng.integers(10, 30))))
                 for _ in range(int(rng.integers(2, 6)))]
        text = "\n".join(l.rstrip() for l in lines)
        img = render_text_image(text, 4)   # scale 4 stays under 1024 → clean
        payload = encode_payload(img, 4, DEFAULT_MARGIN)
        decoded, _, _ = ocr_decode_page(payload, VisionSettings(),
                                        TilingParams.ocr1(), DecodeParameters())
        want = text.split("\n")
        got = [l.rstrip() for l in decoded.split("\n")]
        for w, g in zip(want, got):
            total += len(w)
            correct += sum(1 for a, b in zip(w, g) if a == b)
    assert total > 0 and correct / total > 0.95


# --- config merge layering (J5) ---------------------------------------------

def test_merge_layering():
    base = DecodeParameters()
    patched = merge(base, {"max_new_tokens": 64, "top_k": None})
    assert patched.max_new_tokens == 64
    assert patched.no_repeat_ngram_size == 20   # untouched
    assert patched.top_k is None                # None in patch = keep base

    # dataclass patches and chained layering (defaults <- file <- request)
    file_layer = merge(base, {"temperature": 0.5})
    request_layer = merge(file_layer, {"temperature": 0.9, "seed": 7})
    assert request_layer.temperature == 0.9 and request_layer.seed == 7
    assert merge(base, None) is base

    d = merge(DomParams(), {"min_block_chars": 10})
    assert d.min_block_chars == 10 and d.max_link_density == DomParams().max_link_density
