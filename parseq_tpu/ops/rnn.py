"""Recurrent layers as lax.scans (replaces cuDNN LSTM; SURVEY.md §2.4).

torch nn.LSTM math, gate order (i, f, g, o). TPU-first: the input
projection for all timesteps is one big batched matmul (MXU); only the
recurrent h @ Whh chain runs inside the scan.

Weight layout: wih (input, 4H), whh (H, 4H) — transposed from torch's
weight_ih/hh (4H, in)/(4H, H).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parseq_tpu.ops import layers


def lstm_init(key, input_size, hidden_size):
    k1, k2 = jax.random.split(key)
    # torch LSTM init: uniform(-1/sqrt(H), 1/sqrt(H)) for all params
    bound = 1.0 / jnp.sqrt(hidden_size)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    ks = jax.random.split(k1, 2)
    return {
        'wih': u(ks[0], (input_size, 4 * hidden_size)),
        'whh': u(ks[1], (hidden_size, 4 * hidden_size)),
        'bih': u(jax.random.split(k2, 2)[0], (4 * hidden_size,)),
        'bhh': u(jax.random.split(k2, 2)[1], (4 * hidden_size,)),
    }


def lstm_cell(p, x_proj, h, c):
    """One step. x_proj = x @ wih + bih, precomputed. Returns (h, c)."""
    gates = x_proj + h @ p['whh'].astype(h.dtype) + p['bhh'].astype(h.dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def lstm(p, x, *, reverse=False):
    """x: (B, T, D) -> outputs (B, T, H). Zero initial state (torch default)."""
    B, T, _ = x.shape
    H = p['whh'].shape[0]
    x_proj = x @ p['wih'].astype(x.dtype) + p['bih'].astype(x.dtype)  # (B, T, 4H)

    def step(carry, xp):
        h, c = lstm_cell(p, xp, *carry)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, hs = jax.lax.scan(step, init, x_proj.transpose(1, 0, 2), reverse=reverse)
    return hs.transpose(1, 0, 2)


def bilstm_init(key, input_size, hidden_size, output_size):
    """BidirectionalLSTM (reference modules.py:5-20): biLSTM + linear proj."""
    kf, kb, kl = jax.random.split(key, 3)
    return {
        'fwd': lstm_init(kf, input_size, hidden_size),
        'bwd': lstm_init(kb, input_size, hidden_size),
        'linear': layers.linear_init(kl, 2 * hidden_size, output_size),
    }


def bilstm(p, x):
    out = jnp.concatenate([lstm(p['fwd'], x), lstm(p['bwd'], x, reverse=True)], axis=-1)
    return layers.linear(p['linear'], out)
