"""Token-selection semantics (byte-identity-critical).

Ported semantics (not code) from crates/core/src/sampling.rs:

- ``argmax_first``        — sampling.rs:104-118 (torch tie-break: first index
  wins; non-finite skipped)
- ``apply_repetition_penalty`` — sampling.rs:120-139 (each seen token
  penalized once, f32 math)
- ``banned_ngram_tokens`` — sampling.rs:141-158 (no_repeat_ngram)
- ``apply_top_k`` / ``apply_top_p`` — sampling.rs:160-223
- ``sample_from_logits``  — sampling.rs:225-256 (seeded weighted sampling)
- ``select_token_id``     — sampling.rs:34-102 (full selection policy with
  graceful fallbacks)

All float work is done in float32 where the reference uses f32, float64 where
it uses f64, so results are bit-identical across any partitioning.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..config import DecodeParameters


def init_rng(seed: Optional[int]) -> np.random.Generator:
    """Deterministic RNG when a seed is provided (sampling.rs:26-31).

    The reference uses StdRng::seed_from_u64; we use PCG64 seeded the same
    way on both oracle and pipeline sides, which is all determinism needs.
    """
    if seed is None:
        raise ValueError("unseeded sampling is not allowed in the engine "
                         "(deterministic retries require a per-row seed)")
    return np.random.default_rng(seed)


def argmax_first(values: np.ndarray) -> Optional[int]:
    """First-index-wins argmax skipping non-finite entries (sampling.rs:104-118)."""
    values = np.asarray(values)
    finite = np.isfinite(values)
    if not finite.any():
        return None
    masked = np.where(finite, values, -np.inf)
    return int(np.argmax(masked))  # np.argmax returns the first maximal index


def apply_repetition_penalty(scores: np.ndarray, context: Sequence[int],
                             penalty: float) -> None:
    """In-place penalty on each distinct context token (sampling.rs:120-139).

    positive score → score/penalty, else score*penalty; f32 arithmetic.
    """
    if penalty <= 0.0 or abs(penalty - 1.0) <= np.finfo(np.float32).eps:
        return
    penalty = np.float32(max(penalty, np.finfo(np.float32).tiny))
    n = scores.shape[0]
    seen = set()
    for token in context:
        idx = int(token)
        if 0 <= idx < n and idx not in seen:
            seen.add(idx)
            v = scores[idx]
            scores[idx] = v / penalty if v > 0.0 else v * penalty


def banned_ngram_tokens(sequence: Sequence[int], ngram: int) -> set:
    """Tokens that would complete an already-seen n-gram (sampling.rs:141-158)."""
    banned: set = set()
    if ngram <= 1 or len(sequence) < ngram - 1:
        return banned
    history: dict = {}
    for i in range(len(sequence) - ngram + 1):
        window = sequence[i:i + ngram]
        prefix = tuple(window[:-1])
        history.setdefault(prefix, set()).add(window[-1])
    prefix = tuple(sequence[len(sequence) - (ngram - 1):])
    if prefix in history:
        banned.update(history[prefix])
    return banned


class NgramBanState:
    """Incremental equivalent of ``banned_ngram_tokens`` for a decode loop.

    Appending tokens one at a time maintains the same prefix→next-token
    history the batch function builds from scratch, so ``banned()`` returns
    exactly ``banned_ngram_tokens(context, ngram)`` at every step — verified
    by unit test — in O(1) amortized per step instead of O(len²) per decode.
    """

    def __init__(self, ngram: Optional[int]) -> None:
        self.ngram = ngram if (ngram is not None and ngram > 1) else None
        self.context: list = []
        self.history: dict = {}

    def append(self, token: int) -> None:
        self.context.append(int(token))
        n = self.ngram
        if n is not None and len(self.context) >= n:
            window = tuple(self.context[-n:])
            self.history.setdefault(window[:-1], set()).add(window[-1])

    def banned(self) -> set:
        n = self.ngram
        if n is None or len(self.context) < n - 1:
            return set()
        prefix = tuple(self.context[len(self.context) - (n - 1):])
        return self.history.get(prefix, set())


def apply_top_k(logits: np.ndarray, top_k: int) -> None:
    """Keep the k largest finite logits, set the rest to -inf (sampling.rs:160-174).

    Ranking sorts finite values descending with stable order (earlier index
    wins ties), like the reference's sort over (index, value) pairs.
    """
    finite_idx = np.flatnonzero(np.isfinite(logits))
    if top_k <= 0 or finite_idx.size <= top_k:
        return
    # stable sort by descending value: sort by -value, mergesort keeps order
    order = finite_idx[np.argsort(-logits[finite_idx], kind="stable")]
    drop = order[top_k:]
    logits[drop] = -np.inf


def apply_top_p(logits: np.ndarray, top_p: float) -> None:
    """Nucleus filter: keep the smallest prefix of the descending-softmax
    distribution with cumulative mass > p (sampling.rs:176-223)."""
    finite_idx = np.flatnonzero(np.isfinite(logits))
    if finite_idx.size == 0:
        return
    order = finite_idx[np.argsort(-logits[finite_idx], kind="stable")]
    vals = logits[order].astype(np.float64)
    m = vals[0]
    exps = np.exp(vals - m)
    probs = exps / exps.sum()
    cum = np.cumsum(probs)
    # keep tokens until cumulative mass exceeds top_p (the one that crosses
    # the threshold is kept)
    keep = int(np.searchsorted(cum, top_p, side="right")) + 1
    if keep < order.size:
        logits[order[keep:]] = -np.inf


def sample_from_logits(logits: np.ndarray, rng: np.random.Generator) -> Optional[int]:
    """Seeded weighted sampling over exp-shifted finite logits (sampling.rs:225-256)."""
    finite_idx = np.flatnonzero(np.isfinite(logits))
    if finite_idx.size == 0:
        return None
    vals = logits[finite_idx].astype(np.float64)
    max_logit = vals.max()
    if not np.isfinite(max_logit):
        return None
    weights = np.exp(vals - max_logit)
    weights[~np.isfinite(weights) | (weights <= 0.0)] = 0.0
    total = weights.sum()
    if total <= 0.0:
        return int(finite_idx[int(np.argmax(vals))])
    probs = weights / total
    pick = int(rng.choice(finite_idx.size, p=probs))
    return int(finite_idx[pick])


def _has_valid(values: np.ndarray) -> bool:
    return bool(np.isfinite(values).any())


def select_token_id(logits: np.ndarray, params: DecodeParameters,
                    context: Sequence[int],
                    rng: Optional[np.random.Generator] = None,
                    banned: Optional[set] = None) -> int:
    """Full token-selection policy (sampling.rs:34-102).

    repetition penalty → n-gram ban (reverted if it kills every logit) →
    sampling when enabled, else greedy first-index argmax, with graceful
    fallback to the pre-ban then raw logits, then 0.

    ``banned`` lets a decode loop pass the incrementally-maintained ban set
    (NgramBanState) instead of recomputing it from the whole context.
    """
    logits = np.asarray(logits, dtype=np.float32)
    if logits.size == 0:
        raise ValueError("logits tensor is empty")

    adjusted = logits.copy()
    apply_repetition_penalty(adjusted, context, params.repetition_penalty)

    filtered = adjusted.copy()
    ngram = params.no_repeat_ngram_size
    if ngram is not None and ngram > 1:
        if banned is None:
            banned = banned_ngram_tokens(list(context), ngram)
        n = filtered.shape[0]
        for token in banned:
            if 0 <= int(token) < n:
                filtered[int(token)] = -np.inf
    if not _has_valid(filtered):
        filtered = adjusted.copy()

    if params.do_sample and params.temperature > 0.0:
        logits64 = filtered.astype(np.float64) / float(params.temperature)
        if params.top_k is not None and 0 < params.top_k < logits64.size:
            apply_top_k(logits64, params.top_k)
        if params.top_p is not None and 0.0 <= params.top_p < 1.0:
            apply_top_p(logits64, params.top_p)
        if rng is None:
            rng = init_rng(params.seed)
        sampled = sample_from_logits(logits64, rng)
        if sampled is not None:
            return sampled

    for cand in (filtered, adjusted, logits):
        best = argmax_first(cand)
        if best is not None:
            return best
    return 0
