"""Incremental-decode parity (M13): streaming deltas over the OCR decoder's
growing token prefix reassemble to exactly the final text, with U+FFFD
fragments held back until final — the reference's stdout/SSE contract."""

from deepseek_ocr_rs_ray.functions.raster import CHAR_TO_ID, tokens_to_text
from deepseek_ocr_rs_ray.functions.textops import (DeltaTracker,
                                                   extract_delta,
                                                   normalize_text)


def test_stream_decode_page_deltas_concatenate_to_decode():
    """K4-analogue: the per-step delta stream reassembles to exactly the
    batch decode's output (after the shared final normalize)."""
    from deepseek_ocr_rs_ray.config import (DecodeParameters, TilingParams,
                                            VisionSettings)
    from deepseek_ocr_rs_ray.functions import raster as R
    from deepseek_ocr_rs_ray.functions.extract_row import (ocr_decode_page,
                                                           stream_decode_page)
    text = "HELLO WORLD\nRAY DATA 2026"
    img = R.render_text_image(text, 4)
    payload = R.encode_payload(img, 4, R.DEFAULT_MARGIN)
    args = (payload, VisionSettings(), TilingParams.ocr1(), DecodeParameters())
    deltas = list(stream_decode_page(*args))
    full, _tiles, n_tokens = ocr_decode_page(*args)
    assert all(deltas)                      # no empty emissions
    assert len(deltas) == n_tokens          # one delta per emitted token
    assert normalize_text("".join(deltas)) == full


def test_incremental_decode_reassembles():
    text = "HELLO WORLD\nSECOND LINE"
    tokens = [CHAR_TO_ID[c] for c in text]
    tracker = DeltaTracker()
    emitted = []
    for i in range(1, len(tokens) + 1):
        current = tokens_to_text(tokens[:i])
        emitted.append(tracker.advance(current, is_final=(i == len(tokens))))
    assert "".join(emitted) == text
    # monotone: each delta extends, never rewrites
    assert all(len(d) >= 0 for d in emitted)


def test_replacement_char_holdback_stream():
    # mid-stream partial UTF-8 shows as U+FFFD; held back until completed
    tracker = DeltaTracker()
    out = []
    out.append(tracker.advance("ab", False))
    out.append(tracker.advance("ab�", False))      # incomplete → withheld
    out.append(tracker.advance("abc✓", False))     # completed
    out.append(tracker.advance("abc✓!", True))
    assert "".join(out) == "abc✓!"
    assert out[1] == ""


def test_delta_stale_callback_ignored():
    # callbacks with shorter text than previously emitted produce the
    # divergent suffix, never negative deltas (app.rs:176-179 analogue)
    assert extract_delta("abcdef", "abc") == ""
