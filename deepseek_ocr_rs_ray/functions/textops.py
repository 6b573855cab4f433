"""Text scalar functions (byte-identity-critical, plus corpus-analysis ops).

Ported semantics (not code) from the reference:

- ``normalize_text``    — crates/core/src/inference.rs:228-233
- ``extract_delta`` / ``DeltaTracker`` — crates/core/src/streaming.rs:4-62

The corpus-analysis functions (language id, quality scoring, token counting,
fingerprinting) are new first-class operators for large-scale training-data
pipelines; they have no reference counterpart but follow the same
determinism rules (no wall-clock, no unseeded RNG, integer/exact math).
"""

from __future__ import annotations

import hashlib
import re
import zlib

SENTINEL = "<｜end▁of▁sentence｜>"  # <｜end▁of▁sentence｜>
REPLACEMENT_CHAR = "�"


def normalize_text(s: str) -> str:
    """CRLF→LF, strip the end-of-sentence sentinel, trim whitespace.

    Exact semantics of crates/core/src/inference.rs:228-233 (Rust
    ``str::trim`` trims Unicode whitespace; Python ``str.strip()`` matches).
    """
    return s.replace("\r\n", "\n").replace(SENTINEL, "").strip()


def extract_delta(previous: str, current: str) -> str:
    """Suffix of ``current`` after the longest common prefix with ``previous``.

    Semantics of crates/core/src/streaming.rs:4-18 (char-wise prefix walk).
    """
    if current.startswith(previous):
        return current[len(previous):]
    prefix_chars = 0
    for a, b in zip(previous, current):
        if a != b:
            break
        prefix_chars += 1
    return current[prefix_chars:]


class DeltaTracker:
    """Streaming delta tracker with trailing-U+FFFD holdback.

    Semantics of crates/core/src/streaming.rs:21-62: before the final call,
    any delta containing the replacement character is truncated at its first
    occurrence (held back until complete UTF-8 arrives).
    """

    def __init__(self) -> None:
        self.previous = ""

    def reset(self) -> None:
        self.previous = ""

    def advance(self, current: str, is_final: bool) -> str:
        raw_delta = extract_delta(self.previous, current)
        if not raw_delta:
            self.previous = current
            return raw_delta
        if not is_final:
            idx = raw_delta.find(REPLACEMENT_CHAR)
            if idx == 0:
                return ""
            if idx > 0:
                raw_delta = raw_delta[:idx]
                self.previous = self.previous + raw_delta
                return raw_delta
        self.previous = current
        return raw_delta


# ---------------------------------------------------------------------------
# Corpus-analysis scalar ops (training-data pipeline primitives)
# ---------------------------------------------------------------------------

# Whitespace tokenization is defined EXPLICITLY over the ASCII whitespace
# set so the Python side and the DuckDB/RE2 oracle side agree exactly:
# Python \s and str.strip() cover Unicode whitespace (NBSP, U+2028, ...)
# while RE2's \s and DuckDB's trim() do not — both sides therefore use this
# ASCII set and nothing else. SQL mirror helpers live in pipelines/common.py.
ASCII_WS = " \t\n\r\f\v"
_ASCII_WS_RE = re.compile(r"[ \t\n\r\f\v]+")
_WS_RE = re.compile(r"\s+")  # Unicode splitter for oracle-free heuristics


def ascii_tokens(s: str) -> list:
    """Tokens split on runs of ASCII whitespace after ASCII-trim."""
    t = s.strip(ASCII_WS)
    if not t:
        return []
    return _ASCII_WS_RE.split(t)
# BPE-ish word/number/punct pieces; same pattern string is used verbatim in
# the DuckDB oracle (regexp_extract_all), so keep it RE2-compatible.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
_BPE_RE = re.compile(BPE_ISH_PATTERN)
_DIGIT_RE = re.compile(r"[0-9]")
_UPPER_RE = re.compile(r"[A-Z]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)


def ws_token_count(s: str) -> int:
    """Number of ASCII-whitespace-separated tokens (0 when empty)."""
    return len(ascii_tokens(s))


def bpe_ish_token_count(s: str) -> int:
    """Count of BPE-ish pieces: letter runs, digit runs, single punctuation."""
    return len(_BPE_RE.findall(s))


# Python-re's \s for str, spelled out as an explicit char set so the RE2
# engines (pyarrow below, DuckDB in the SQL mirrors) can be handed a class
# with IDENTICAL semantics — RE2's own \s is ASCII-only and excludes \v.
# test_cross_engine_fuzz pins this literal against enumerating re.match(r"\s").
PY_RE_WS = ("\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
            "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
            "\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000")
_BPE_ISH_PATTERN_RE2 = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9" + PY_RE_WS + "]"


def ws_token_counts_arrow(arr):
    """Vectorized ``ws_token_count`` over a pyarrow string array: a token is
    a maximal run of chars outside the explicit ASCII-ws set, so counting
    non-overlapping matches of one run-pattern equals strip+split — parity
    with the scalar kernel is fuzz-pinned (test_cross_engine_fuzz)."""
    import pyarrow.compute as pc
    return pc.count_substring_regex(arr, pattern=r"[^ \t\n\f\r\v]+")


def bpe_ish_token_counts_arrow(arr):
    """Vectorized ``bpe_ish_token_count`` (RE2 gets the Python-\\s-explicit
    class, so both engines count the same pieces)."""
    import pyarrow.compute as pc
    return pc.count_substring_regex(arr, pattern=_BPE_ISH_PATTERN_RE2)


def digit_counts_arrow(arr):
    """Vectorized ``len(_DIGIT_RE.findall(s))``."""
    import pyarrow.compute as pc
    return pc.count_substring_regex(arr, pattern="[0-9]")


_STOPWORDS = {
    "en": frozenset("the a an and or of to in is are was were be been it this that with for on as at by from not".split()),
    "de": frozenset("der die das und oder von zu in ist sind war waren sein mit für auf als bei aus nicht ein eine".split()),
    "fr": frozenset("le la les un une et ou de du des à en est sont était avec pour sur par pas ne ce cette".split()),
}

_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")


def detect_lang(s: str) -> str:
    """Tiny deterministic language-id heuristic over {en,de,fr,zh,unk}.

    CJK presence → zh; otherwise the language whose stopword profile scores
    highest over the lowercased whitespace tokens; ties broken by fixed
    language order (en, de, fr); score 0 → unk.

    Tokenization uses the explicit ASCII-whitespace set (repo rule: both
    engines split identically) so the DuckDB oracle can mirror it exactly.
    """
    if _CJK_RE.search(s):
        return "zh"
    toks = [t.lower() for t in ascii_tokens(s)]
    if not toks:
        return "unk"
    best_lang, best_score = "unk", 0
    for lang in ("en", "de", "fr"):
        sw = _STOPWORDS[lang]
        score = sum(1 for t in toks if t in sw)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def quality_scores(s: str) -> dict:
    """Deterministic quality-signal bundle for a document.

    Returns integer counts plus float ratios derived from them only (so the
    floats are exact functions of the ints and reproduce bit-identically).
    """
    n_chars = len(s)
    toks = ascii_tokens(s)
    n_tokens = len(toks)
    token_chars = sum(len(t) for t in toks)
    n_digits = len(_DIGIT_RE.findall(s))
    n_upper = len(_UPPER_RE.findall(s))
    n_punct = len(_PUNCT_RE.findall(s))
    stop = _STOPWORDS["en"]
    n_stop = sum(1 for t in toks if t.lower() in stop)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (token_chars / n_tokens) if n_tokens else 0.0,
        "digit_ratio": (n_digits / n_chars) if n_chars else 0.0,
        "upper_ratio": (n_upper / n_chars) if n_chars else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop / n_tokens) if n_tokens else 0.0,
    }


_FP_BASE = 1000003
_FP_MASK = (1 << 64) - 1


def rolling_fingerprint(s: str) -> int:
    """64-bit polynomial rolling hash over UTF-8 bytes (document fingerprint).

    h = sum(b_i * BASE^(n-1-i)) mod 2^64 — deterministic, order-sensitive.
    """
    h = 0
    for b in s.encode("utf-8"):
        h = ((h * _FP_BASE) + b) & _FP_MASK
    return h


def md5_hex(s: str) -> str:
    """MD5 hex digest of the UTF-8 bytes (matches DuckDB ``md5(text)``)."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def crc32_str(s: str) -> int:
    """Deterministic 32-bit hash used for routing/sampling decisions."""
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def shingles(s: str, k: int) -> set:
    """Set of k-character shingles of the lowercased, whitespace-collapsed text."""
    t = " ".join(_WS_RE.split(s.strip())).lower()
    if len(t) < k:
        return {t} if t else set()
    return {t[i:i + k] for i in range(len(t) - k + 1)}


def word_ngrams(s: str, n: int) -> set:
    """Set of word n-grams (lowercased whitespace tokens)."""
    toks = [t.lower() for t in _WS_RE.split(s.strip()) if t]
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
