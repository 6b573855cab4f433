"""Cross-engine determinism fuzz: the Python kernels and the DuckDB SQL
idioms the oracles are built from must agree on ARBITRARY inputs, not just
the fixture corpus (hypothesis-driven; no Ray session needed).

Surfaces fuzzed: exact-cents money math, the 1e-6 similarity truncation,
ASCII-whitespace tokenization, md5 fingerprints, the md5-hex→UBIGINT
simhash feature hash, and the langid rule mirror.
"""

import duckdb
import hypothesis.strategies as st
import pytest
from hypothesis import given, settings

from deepseek_ocr_rs_ray.functions import textops as T

con = duckdb.connect()

# printable ASCII + the explicit whitespace set (the tokenization domain)
_ASCII_TEXT = st.text(
    alphabet=st.sampled_from(
        [chr(c) for c in range(33, 127)] + list(" \t\n\r\f\v")),
    max_size=200)


def _sql_scalar(expr: str, **params):
    keys = list(params)
    sql = f"SELECT {expr} FROM (SELECT " + ", ".join(
        f"? AS {k}" for k in keys) + ")"
    return con.execute(sql, [params[k] for k in keys]).fetchone()[0]


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-1e7, max_value=1e7,
                 allow_nan=False, allow_infinity=False))
def test_cents_math_matches_duckdb(x):
    import numpy as np

    from deepseek_ocr_rs_ray.pipelines.common import cents_np
    py = int(cents_np(np.array([x]))[0])
    sql = _sql_scalar("CAST(FLOOR(v*100 + 0.5) AS BIGINT)", v=x)
    assert py == int(sql)


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-1.0, max_value=1.0,
                 allow_nan=False, allow_infinity=False))
def test_round6_matches_duckdb(x):
    import numpy as np

    from deepseek_ocr_rs_ray.pipelines.common import round6_np
    py = float(round6_np(np.array([x]))[0])
    sql = _sql_scalar("FLOOR(v*1000000 + 0.5)/1000000", v=x)
    assert py == float(sql)


@settings(max_examples=200, deadline=None)
@given(_ASCII_TEXT)
def test_ascii_tokenization_matches_duckdb(s):
    sql = _sql_scalar(
        r"CASE WHEN trim(v, ' ' || chr(9) || chr(10) || chr(13) || chr(12)"
        r" || chr(11)) = '' THEN 0 ELSE len(regexp_split_to_array("
        r"trim(v, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)),"
        r" '[ \t\n\f\r\v]+')) END", v=s)
    assert T.ws_token_count(s) == int(sql)


@settings(max_examples=200, deadline=None)
@given(_ASCII_TEXT)
def test_md5_matches_duckdb(s):
    assert T.md5_hex(s) == _sql_scalar("md5(v)", v=s)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=1000,
                                      exclude_categories=("Cs",)),
               min_size=1, max_size=30))
def test_simhash_feature_hash_matches_duckdb(tok):
    """int.from_bytes(md5[:8], 'big') == ('0x' || substr(md5,1,16))::UBIGINT."""
    import hashlib
    py = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
    sql = _sql_scalar("('0x' || substr(md5(v), 1, 16))::UBIGINT", v=tok)
    assert py == int(sql)


@settings(max_examples=150, deadline=None)
@given(_ASCII_TEXT)
def test_langid_rule_matches_sql_mirror(s):
    """detect_lang == the exact CASE mirror used by Q_LANGID_SQL."""
    from deepseek_ocr_rs_ray.pipelines.corpus import _sql_str_list
    toks_expr = (
        r"list_filter(list_transform(regexp_split_to_array("
        r"trim(v, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)),"
        r" '[ \t\n\f\r\v]+'), x -> lower(x)), x -> x <> '')")
    score = {lang: _sql_scalar(
        f"len(list_filter({toks_expr}, "
        f"x -> list_contains({_sql_str_list(T._STOPWORDS[lang])}, x)))", v=s)
        for lang in ("en", "de", "fr")}
    s_en, s_de, s_fr = (int(score[k]) for k in ("en", "de", "fr"))
    if s_en > 0 and s_en >= s_de and s_en >= s_fr:
        sql_pred = "en"
    elif s_de > 0 and s_de >= s_fr:
        sql_pred = "de"
    elif s_fr > 0:
        sql_pred = "fr"
    else:
        sql_pred = "unk"
    assert T.detect_lang(s) == sql_pred


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=4096),
       st.integers(min_value=1, max_value=4096))
def test_smart_resize_invariants(h, w):
    from deepseek_ocr_rs_ray.functions.imageops import smart_resize
    factor, min_p, max_p = 28, 3136, 28 * 28 * 1280
    try:
        hb, wb = smart_resize(h, w, factor, min_p, max_p)
    except ValueError:
        aspect = max(h, w) / min(h, w)
        assert aspect > 180  # only the aspect/degenerate guards may raise
        return
    assert hb % factor == 0 and wb % factor == 0
    assert hb >= factor and wb >= factor
    assert hb * wb <= max_p or (h * w) <= max_p  # floor clamp never exceeds


@settings(max_examples=150, deadline=None)
@given(st.one_of(
    # arbitrary dims
    st.tuples(st.integers(1, 3000), st.integers(1, 3000)),
    # dims whose aspect EXACTLY matches several candidate grids at once
    # (e.g. 2/1 == 4/2 == 8/4) — the regime the area tie-break exists for
    st.tuples(st.integers(1, 9), st.integers(1, 9),
              st.integers(1, 400)).map(lambda t: (t[0] * t[2], t[1] * t[2])),
))
def test_best_grid_matches_sql_mirror(wh):
    """best_grid (the eps-window tie + area tie-break from
    preprocess.rs:96-111) vs the q_prompt_tokens oracle's pick CTE on
    arbitrary dims — including exact-ratio multiples that produce multi-way
    ties."""
    from deepseek_ocr_rs_ray.config import TilingParams
    from deepseek_ocr_rs_ray.functions.imageops import best_grid
    from deepseek_ocr_rs_ray.pipelines.corpus import _tiling_candidates_sql
    w, h = wh
    params = TilingParams.ocr1()
    py = best_grid(w, h, params)
    ts = params.tile_size
    sql = f"""
WITH m(width, height) AS (VALUES (?, ?)),
cand(w, h) AS (VALUES {_tiling_candidates_sql()}),
diffs AS (
  SELECT cand.w, cand.h,
         ABS(CAST(m.width AS DOUBLE)/m.height
             - CAST(cand.w AS DOUBLE)/cand.h) AS diff,
         CAST(m.width AS DOUBLE)*m.height
             > 0.5*{ts}*{ts}*cand.w*cand.h AS area_ok
  FROM m, cand
),
mins AS (SELECT MIN(diff) AS md FROM diffs),
ties AS (
  SELECT d.* FROM diffs d, mins WHERE d.diff - mins.md < 2.220446049250313e-16
)
SELECT w, h FROM (
  SELECT w, h,
         ROW_NUMBER() OVER (ORDER BY area_ok DESC,
           CASE WHEN area_ok THEN -(w*100 + h) ELSE (w*100 + h) END ASC) AS rn
  FROM ties) WHERE rn = 1
"""
    got = con.execute(sql, [w, h]).fetchone()
    assert (int(got[0]), int(got[1])) == py, (w, h, py, got)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=10**9))
def test_log2_matches_duckdb_on_int_counts(c):
    """The token-entropy oracle assumes CPython math.log2 and DuckDB log2
    resolve to bit-identical doubles on integer count inputs (the entropy
    sum's term domain). A host/libm divergence must fail HERE, loudly,
    not as a flaky hash mismatch in the driver gate."""
    import math
    py = math.log2(float(c))
    sql = _sql_scalar("log2(CAST(v AS DOUBLE))", v=c)
    assert py == float(sql)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=10**6),
       st.integers(min_value=1, max_value=10**6))
def test_entropy_term_matches_duckdb(c, n):
    """One full entropy term — c·log2(c) and log2(n) composed exactly as
    both engines spell it (quality.py vs Q_TOKEN_ENTROPY_SQL)."""
    import math
    py = float(c) * math.log2(float(c))
    sql = _sql_scalar("CAST(v AS DOUBLE) * log2(CAST(v AS DOUBLE))", v=c)
    assert py == float(sql)
    py_h = math.log2(float(n)) - py / float(n)
    sql_h = _sql_scalar(
        "log2(CAST(n AS DOUBLE)) - CAST(v AS DOUBLE)"
        " * log2(CAST(v AS DOUBLE)) / CAST(n AS DOUBLE)", v=c, n=n)
    assert py_h == float(sql_h)


# text domain for the vectorized-kernel parity checks: printable ASCII,
# every Python-\s whitespace char, multibyte letters, CJK, an astral char
_WS_EDGE_TEXT = st.text(
    alphabet=st.sampled_from(
        [chr(c) for c in range(33, 127)]
        + list(T.PY_RE_WS) + list("héß中文👍")),
    max_size=120)


def test_py_re_ws_literal_is_exact():
    """PY_RE_WS == the chars Python-re's \\s actually matches (str mode)."""
    import re
    want = {chr(i) for i in range(0x11000) if re.match(r"\s", chr(i))}
    assert set(T.PY_RE_WS) == want


@settings(max_examples=300, deadline=None)
@given(st.lists(_WS_EDGE_TEXT, max_size=8))
def test_arrow_count_kernels_match_scalar(texts):
    """The RE2-vectorized counting kernels (ws tokens, BPE-ish pieces,
    digits) == the scalar Python-re kernels on arbitrary input, including
    the \\v / U+0085 / NBSP chars where RE2's own \\s would diverge."""
    import pyarrow as pa
    arr = pa.array(texts, pa.string())
    assert T.ws_token_counts_arrow(arr).to_pylist() == \
        [T.ws_token_count(s) for s in texts]
    assert T.bpe_ish_token_counts_arrow(arr).to_pylist() == \
        [T.bpe_ish_token_count(s) for s in texts]
    assert T.digit_counts_arrow(arr).to_pylist() == \
        [len(T._DIGIT_RE.findall(s)) for s in texts]
