"""DOM extraction: boilerplate stripping, spans, payload capture."""

import base64

import numpy as np

from deepseek_ocr_rs_ray.config import DomParams
from deepseek_ocr_rs_ray.functions.dom import extract_dom
from deepseek_ocr_rs_ray.functions.raster import encode_payload


def _page(body: str) -> bytes:
    return f"<!DOCTYPE html><html><head><title>T</title></head><body>{body}</body></html>".encode()


MAIN = ("<main><p>" + "Real content sentence with quite a few words in it. " * 3 +
        "</p></main>")


def test_nav_links_stripped_main_kept():
    nav = '<nav><ul>' + ''.join(f'<li><a href="/x{i}">link {i}</a></li>'
                                for i in range(20)) + '</ul></nav>'
    res = extract_dom(_page(nav + MAIN))
    assert res["ok"]
    assert "Real content sentence" in res["text"]
    assert "link 3" not in res["text"]


def test_script_style_excluded():
    body = "<script>var x = 'not content but long enough to be a block of text';</script>" + MAIN
    res = extract_dom(_page(body))
    assert "not content" not in res["text"]
    assert "Real content" in res["text"]


def test_link_density_filter():
    # a block that is mostly anchor text gets dropped even outside nav
    linky = ('<div><p>' +
             ' '.join(f'<a href="/y{i}">anchor text piece {i}</a>' for i in range(10)) +
             '</p></div>')
    res = extract_dom(_page(linky + MAIN))
    assert "anchor text piece" not in res["text"]


def test_short_blocks_dropped():
    res = extract_dom(_page("<p>tiny</p>" + MAIN))
    assert "tiny" not in res["text"]


def test_spans_point_into_html_bytes():
    html = _page(MAIN)
    res = extract_dom(html)
    assert res["spans"], "expected at least one span"
    for s, e in res["spans"]:
        frag = html[s:e].decode("utf-8")
        assert "Real content sentence" in frag


def test_spans_multibyte_offsets():
    body = "<p>Ünïcödé prefix — " + "müller straße " * 10 + "</p>" + MAIN
    html = _page(body)
    res = extract_dom(html)
    for s, e in res["spans"]:
        html[s:e].decode("utf-8")  # must be valid UTF-8 slice boundaries


def test_entity_unescape():
    body = "<p>" + "filler words to pass the minimum block length easily " * 2 + "AT&amp;T rocks &lt;3</p>"
    res = extract_dom(_page(body), DomParams(min_block_chars=10, min_doc_chars=10))
    assert "AT&T" in res["text"]
    assert "<3" in res["text"]


def test_payload_capture_and_span():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    payload = encode_payload(img, 2, 2)
    b64 = base64.b64encode(payload).decode()
    html = _page(f'<main><img data-payload="{b64}" alt="scan"/></main>')
    res = extract_dom(html)
    assert not res["ok"]
    assert res["payload"] == payload
    s, e = res["payload_span"]
    assert html[s:e].startswith(b"<img")


def test_degenerate_html():
    res = extract_dom(b"")
    assert res["text"] == "" and not res["ok"] and res["payload"] is None
    res = extract_dom(b"plain text, no tags at all, but reasonably long content here ok")
    assert "plain text" in res["text"]


def test_null_html_through_batch_stage():
    import pyarrow as pa

    from deepseek_ocr_rs_ray.functions.extract_row import extract_row
    from deepseek_ocr_rs_ray.stages.dom import DomExtract
    batch = pa.table({
        "url": pa.array(["u1"]),
        "warc_ts": pa.array([1], pa.timestamp("us")),
        "html": pa.array([None], pa.binary()),
        "lang": pa.array(["en"]),
    })
    out = DomExtract()(batch)
    assert out.column("method").to_pylist() == ["dom"]
    assert out.column("extracted_text").to_pylist() == [""]
    assert extract_row("u", None)["method"] == "dom"


def test_invalid_utf8_span_fidelity():
    # invalid bytes before the content must not shift byte offsets
    prefix = b"\xff\xfe<p>"
    body = ("real content sentence with quite a few words in it. " * 3).encode()
    html = b"<html><body>" + prefix + body + b"</p></body></html>"
    res = extract_dom(html)
    assert res["spans"], "content block expected"
    s, e = res["spans"][0]
    frag = html[s:e]
    assert b"real content sentence" in frag
    # the span start lands exactly on the first content byte, not 2 off
    assert frag.startswith(b"real content")
    # extracted text is valid UTF-8 with invalid bytes scrubbed
    res["text"].encode("utf-8")


def test_invalid_utf8_inside_content():
    bad = b"<p>before \xc3\x28 after " + b"filler words to reach the threshold " * 3 + b"</p>"
    res = extract_dom(bad)
    res["text"].encode("utf-8")  # no surrogates escape
    for s, e in res["spans"]:
        assert 0 <= s <= e <= len(bad)
