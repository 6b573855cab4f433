"""Main-content DOM extraction: text-density / link-density boilerplate strip.

A Boilerpipe/trafilatura-style heuristic re-expressed from scratch (the
reference has no DOM stage — its per-record decode pipeline is the model for
the OCR fallback; this stage is the "fast path" the north rule asks for):

- single-pass regex tag scanner over the UTF-8-decoded page (no external
  HTML libs in the container), maintaining an open-tag stack;
- text runs grouped into blocks at block-level tag boundaries;
- per block: total chars, anchor chars (link density), boilerplate-ancestor
  flag (nav/header/footer/aside/script/style/...);
- keep blocks with >= min_block_chars, link density <= max_link_density and
  no boilerplate ancestor; emit their whitespace-collapsed, entity-unescaped
  text joined by blank lines, plus byte-offset spans into the original
  ``html`` payload.

Everything is deterministic pure Python with precompiled regexes; the
returned text goes through ``normalize_text`` (the reference's output
normalization contract, crates/core/src/inference.rs:228-233).
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import List, Optional, Tuple

from ..config import DomParams
from .textops import normalize_text

# tags whose subtree is never content
BOILER_TAGS = frozenset((
    "script", "style", "noscript", "nav", "header", "footer", "aside",
    "form", "iframe", "svg", "template", "button", "select", "option",
    "head", "title",
))
# tags that terminate the current text block
BLOCK_TAGS = frozenset((
    "p", "div", "section", "article", "main", "body", "html", "ul", "ol",
    "li", "table", "thead", "tbody", "tr", "td", "th", "h1", "h2", "h3",
    "h4", "h5", "h6", "br", "blockquote", "pre", "figure", "figcaption",
    "hr", "dl", "dt", "dd",
))
VOID_TAGS = frozenset(("br", "hr", "img", "meta", "link", "input", "area",
                       "base", "col", "embed", "source", "track", "wbr"))

_TOKEN_RE = re.compile(r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[^>]*>", re.S)
_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9-]*)")
_PAYLOAD_RE = re.compile(r'data-payload="([A-Za-z0-9+/=]+)"')
_WS_RUN_RE = re.compile(r"\s+")


class _Block:
    __slots__ = ("segments", "total_chars", "anchor_chars", "boiler")

    def __init__(self) -> None:
        self.segments: List[Tuple[int, int, str]] = []  # (char_start, char_end, text)
        self.total_chars = 0
        self.anchor_chars = 0
        self.boiler = False


def parse_blocks(page: str):
    """Scan the page into text blocks.

    Returns (blocks, payload) where payload is None or
    (b64_string, tag_char_start, tag_char_end) of the first <img data-payload>.
    """
    blocks: List[_Block] = []
    cur = _Block()
    boiler_depth = 0
    anchor_depth = 0
    payload: Optional[Tuple[str, int, int]] = None
    pos = 0
    n = len(page)

    def flush():
        nonlocal cur
        if cur.segments:
            blocks.append(cur)
            cur = _Block()

    for m in _TOKEN_RE.finditer(page):
        # text run before this tag
        if m.start() > pos:
            text = page[pos:m.start()]
            stripped = text.strip()
            if stripped:
                # " ".join(split()) == collapse whitespace runs; ~4x faster
                # than a regex sub on the hot path
                collapsed = " ".join(stripped.split())
                cur.segments.append((pos, m.start(), collapsed))
                cur.total_chars += len(collapsed)
                if anchor_depth > 0:
                    cur.anchor_chars += len(collapsed)
                if boiler_depth > 0:
                    cur.boiler = True
        pos = m.end()
        tag = m.group(0)
        if tag.startswith("<!"):
            continue
        name_m = _TAG_NAME_RE.match(tag)
        if not name_m:
            continue
        name = name_m.group(1).lower()
        closing = tag.startswith("</")
        self_closing = tag.endswith("/>") or name in VOID_TAGS

        if name == "img" and payload is None:
            pm = _PAYLOAD_RE.search(tag)
            if pm:
                payload = (pm.group(1), m.start(), m.end())

        if name in BLOCK_TAGS:
            flush()
        if name == "a":
            if closing:
                anchor_depth = max(anchor_depth - 1, 0)
            elif not self_closing:
                anchor_depth += 1
        if name in BOILER_TAGS:
            if closing:
                boiler_depth = max(boiler_depth - 1, 0)
            elif not self_closing:
                boiler_depth += 1

    if pos < n:
        text = page[pos:n]
        stripped = text.strip()
        if stripped:
            collapsed = " ".join(stripped.split())
            cur.segments.append((pos, n, collapsed))
            cur.total_chars += len(collapsed)
            if anchor_depth > 0:
                cur.anchor_chars += len(collapsed)
            if boiler_depth > 0:
                cur.boiler = True
    flush()
    return blocks, payload


_SURROGATE_RE = re.compile("[\ud800-\udfff]")


def _char_to_byte_offsets(page: str, char_positions: List[int]) -> dict:
    """Map char offsets → UTF-8 byte offsets in one pass over the string.

    The page is decoded with errors='surrogateescape' (one char per invalid
    byte), so re-encoding the same way restores exact byte lengths — span
    offsets stay correct even when the input isn't valid UTF-8.
    """
    wanted = sorted(set(char_positions))
    out = {}
    prev_char = 0
    prev_byte = 0
    for cp in wanted:
        prev_byte += len(page[prev_char:cp].encode("utf-8",
                                                   errors="surrogateescape"))
        prev_char = cp
        out[cp] = prev_byte
    return out


def extract_dom(html_bytes: bytes, params: DomParams = DomParams()):
    """Extract main content from an HTML payload.

    Returns dict:
      text: str          normalized main content ("" when extraction fails)
      spans: list[(start_byte, end_byte)]  per kept block, into html_bytes
      ok: bool           True when text length >= params.min_doc_chars
      payload: bytes|None  decoded raster payload when an <img data-payload>
                           was present (the OCR fallback input)
      payload_span: (start_byte, end_byte)|None  of the <img> tag in html_bytes
    """
    # surrogateescape keeps a 1:1 char↔byte mapping for invalid UTF-8 (see
    # _char_to_byte_offsets); the surrogates are scrubbed to U+FFFD before
    # any text leaves this function so outputs stay valid UTF-8
    page = html_bytes.decode("utf-8", errors="surrogateescape")
    blocks, payload_info = parse_blocks(page)

    kept = []
    for b in blocks:
        if b.boiler or b.total_chars < params.min_block_chars:
            continue
        if b.total_chars > 0 and b.anchor_chars / b.total_chars > params.max_link_density:
            continue
        kept.append(b)

    parts = []
    char_spans = []
    for b in kept:
        part = _htmllib.unescape(" ".join(seg[2] for seg in b.segments))
        parts.append(_SURROGATE_RE.sub("�", part))
        char_spans.append((b.segments[0][0], b.segments[-1][1]))
    text = normalize_text("\n\n".join(parts))

    # char → byte spans into the original payload
    all_pos = [p for s in char_spans for p in s]
    if payload_info is not None:
        all_pos.extend((payload_info[1], payload_info[2]))
    mapping = _char_to_byte_offsets(page, all_pos) if all_pos else {}
    spans = [(mapping[s], mapping[e]) for s, e in char_spans]

    payload = None
    payload_span = None
    if payload_info is not None:
        import base64
        try:
            payload = base64.b64decode(payload_info[0], validate=True)
            payload_span = (mapping[payload_info[1]], mapping[payload_info[2]])
        except Exception:
            payload = None

    ok = len(text) >= params.min_doc_chars
    return {"text": text, "spans": spans, "ok": ok, "payload": payload,
            "payload_span": payload_span}
