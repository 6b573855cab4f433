"""Incremental-decode parity (M13): streaming deltas over the OCR decoder's
growing token prefix reassemble to exactly the final text, with U+FFFD
fragments held back until final — the reference's stdout/SSE contract."""

from deepseek_ocr_rs_ray.functions.raster import CHAR_TO_ID, tokens_to_text
from deepseek_ocr_rs_ray.functions.textops import DeltaTracker, extract_delta


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
