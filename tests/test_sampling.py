"""Decode-semantics vectors (FIXTURES.md §3 decode_cases): argmax tie-break,
repetition penalty, n-gram ban, top-k/p, seeded sampling — cross-checked
against the independent naive implementation in oracle.py."""

import numpy as np
from hypothesis import given, settings, strategies as st

from deepseek_ocr_rs_ray.config import DecodeParameters
from deepseek_ocr_rs_ray.functions import sampling as S
from deepseek_ocr_rs_ray.oracle import select_greedy_naive


def test_argmax_first_index_tie_break():
    assert S.argmax_first(np.array([1.0, 3.0, 3.0, 2.0], np.float32)) == 1
    assert S.argmax_first(np.array([np.nan, 2.0, 2.0], np.float32)) == 1
    assert S.argmax_first(np.array([-np.inf, -np.inf], np.float32)) is None
    assert S.argmax_first(np.array([np.inf, 5.0], np.float32)) == 1  # inf skipped, finite wins


def test_repetition_penalty_pos_neg():
    scores = np.array([2.0, -2.0, 1.0], dtype=np.float32)
    S.apply_repetition_penalty(scores, [0, 1, 0], 2.0)  # token 0 penalized once
    assert scores[0] == np.float32(1.0)     # positive divided
    assert scores[1] == np.float32(-4.0)    # negative multiplied
    assert scores[2] == np.float32(1.0)     # untouched
    scores2 = np.array([2.0], dtype=np.float32)
    S.apply_repetition_penalty(scores2, [0], 1.0)  # penalty 1.0 = no-op
    assert scores2[0] == np.float32(2.0)


def test_banned_ngram_tokens_basic():
    # sequence [1,2,3,1,2] with ngram=3: prefix (1,2) previously followed by 3
    assert S.banned_ngram_tokens([1, 2, 3, 1, 2], 3) == {3}
    assert S.banned_ngram_tokens([1, 2], 3) == set()
    assert S.banned_ngram_tokens([1, 1, 1, 1], 2) == {1}
    assert S.banned_ngram_tokens([5, 6], 1) == set()


@given(st.lists(st.integers(0, 5), min_size=0, max_size="40".__len__() * 10),
       st.integers(2, 5))
@settings(max_examples=200, deadline=None)
def test_ngram_ban_state_matches_batch(seq, ngram):
    state = S.NgramBanState(ngram)
    for i, tok in enumerate(seq):
        assert state.banned() == S.banned_ngram_tokens(seq[:i], ngram)
        state.append(tok)
    assert state.banned() == S.banned_ngram_tokens(seq, ngram)


def test_top_k_keeps_k_largest():
    l = np.array([1.0, 5.0, 3.0, 5.0, 2.0], dtype=np.float64)
    S.apply_top_k(l, 2)
    assert np.isfinite(l[1]) and np.isfinite(l[3])
    assert not np.isfinite(l[0]) and not np.isfinite(l[2]) and not np.isfinite(l[4])


def test_top_p_keeps_crossing_token():
    # one dominant token: top_p=0.5 keeps only it
    l = np.array([10.0, 0.0, 0.0], dtype=np.float64)
    S.apply_top_p(l, 0.5)
    assert np.isfinite(l[0]) and not np.isfinite(l[1])
    # uniform: p=0.5 → cum hits 0.5 exactly at the 2nd (not >p), crosses at
    # the 3rd → keep three of four (reference keeps the crossing token)
    l2 = np.zeros(4, dtype=np.float64)
    S.apply_top_p(l2, 0.5)
    assert np.isfinite(l2[:3]).all() and not np.isfinite(l2[3])


def test_seeded_sampling_deterministic():
    logits = np.array([0.0, 1.0, 2.0, 3.0], dtype=np.float64)
    a = S.sample_from_logits(logits.copy(), S.init_rng(7))
    b = S.sample_from_logits(logits.copy(), S.init_rng(7))
    assert a == b


@given(st.lists(st.floats(-10, 10, width=32), min_size=2, max_size=30),
       st.lists(st.integers(0, 29), min_size=0, max_size=60),
       st.sampled_from([1.0, 1.3]), st.sampled_from([None, 2, 3, 20]))
@settings(max_examples=200, deadline=None)
def test_select_matches_naive(logits, context, penalty, ngram):
    params = DecodeParameters(repetition_penalty=penalty,
                              no_repeat_ngram_size=ngram)
    got = S.select_token_id(np.array(logits, np.float32), params, context)
    want = select_greedy_naive(logits, context, penalty, ngram or 0)
    assert got == want


def test_select_falls_back_when_ban_kills_everything():
    # ngram=2, context [0,1,0] bans token 1 after prefix (0,); only token 1 finite
    logits = np.array([-np.inf, 5.0], dtype=np.float32)
    params = DecodeParameters(no_repeat_ngram_size=2)
    context = [0, 1, 0]
    # ban would kill index 1 → everything -inf → revert to adjusted → pick 1
    assert S.select_token_id(logits, params, context) == 1
