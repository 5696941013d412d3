"""CTC loss: native forward (log-alpha) recursion as a lax.scan.

TPU-native replacement for torch F.ctc_loss (reference base.py:213-221).
Fixed shapes throughout: targets are padded to max length and masked by
`target_lengths`. Matches torch semantics: reduction='mean' divides each
sample's loss by its target length before averaging; zero_infinity=True
zeroes non-finite sample losses.

Also provides greedy best-path decoding helpers used by CTC models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def ctc_loss(log_probs, targets, target_lengths, *, blank=0, zero_infinity=True,
             input_lengths=None, reduction='mean'):
    """log_probs: (B, T, C) log-softmax outputs. targets: (B, L) int ids
    (padded arbitrarily past target_lengths). Returns scalar loss ('mean')
    or per-sample losses ('none')."""
    log_probs = log_probs.astype(jnp.float32)
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1

    s_idx = jnp.arange(S)
    # Extended target sequence: blank, t0, blank, t1, ..., blank
    ext = jnp.where(s_idx % 2 == 1, targets[:, jnp.minimum(s_idx // 2, L - 1)], blank)  # (B, S)
    s_len = 2 * target_lengths + 1  # effective extended length per sample
    s_valid = s_idx[None, :] < s_len[:, None]  # (B, S)

    # Transition structure: alpha[s] <- alpha[s] + alpha[s-1] (+ alpha[s-2]
    # when ext[s] is a label different from ext[s-2]).
    ext_m2 = jnp.concatenate([jnp.full((B, 2), -1, ext.dtype), ext[:, :-2]], axis=1)
    allow_skip = (s_idx[None, :] % 2 == 1) & (ext != ext_m2)

    def emit(t):
        return jnp.take_along_axis(log_probs[:, t], ext, axis=-1)  # (B, S)

    alpha0 = jnp.full((B, S), _NEG)
    alpha0 = alpha0.at[:, 0].set(log_probs[:, 0, blank])
    alpha0 = alpha0.at[:, 1].set(jnp.where(target_lengths > 0,
                                           jnp.take_along_axis(log_probs[:, 0], ext[:, 1:2], -1)[:, 0],
                                           _NEG))
    alpha0 = jnp.where(s_valid, alpha0, _NEG)

    def step(alpha, t):
        shift1 = jnp.concatenate([jnp.full((B, 1), _NEG), alpha[:, :-1]], axis=1)
        shift2 = jnp.concatenate([jnp.full((B, 2), _NEG), alpha[:, :-2]], axis=1)
        a = _logaddexp(alpha, shift1)
        a = jnp.where(allow_skip, _logaddexp(a, shift2), a)
        alpha_t = a + emit(t)
        alpha_t = jnp.where(s_valid, alpha_t, _NEG)
        if input_lengths is not None:
            alpha_t = jnp.where((t < input_lengths)[:, None], alpha_t, alpha)
        return alpha_t, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))

    last = jnp.take_along_axis(alpha, (s_len - 1)[:, None], axis=1)[:, 0]
    last2 = jnp.take_along_axis(alpha, jnp.maximum(s_len - 2, 0)[:, None], axis=1)[:, 0]
    # Empty targets (s_len == 1): only the all-blank path exists; without the
    # mask, last and last2 would read the same cell and double-count it.
    last2 = jnp.where(s_len >= 2, last2, _NEG)
    nll = -_logaddexp(last, last2)

    if zero_infinity:
        nll = jnp.where(nll > 0.5 * -_NEG, 0.0, nll)
        nll = jnp.where(jnp.isfinite(nll), nll, 0.0)
    if reduction == 'none':
        return nll
    # torch 'mean': per-sample loss / target_length, then batch mean
    denom = jnp.maximum(target_lengths, 1).astype(jnp.float32)
    return jnp.mean(nll / denom)


def greedy_decode_ids(logits):
    """(B, T, C) -> per-position argmax ids (B, T); dedupe happens in the
    CTCTokenizer (best-path decode)."""
    return jnp.argmax(logits, axis=-1)
