"""Op-level parity with torch primitives (the reference's building blocks)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from parseq_tpu.ops import layers


def t2n(t):
    return t.detach().cpu().numpy()


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(0)
    np.random.seed(0)


def test_layer_norm_matches_torch():
    x = np.random.randn(4, 7, 16).astype(np.float32)
    ln = nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.copy_(torch.randn(16))
        ln.bias.copy_(torch.randn(16))
    want = t2n(ln(torch.from_numpy(x)))
    p = {'scale': jnp.asarray(t2n(ln.weight)), 'bias': jnp.asarray(t2n(ln.bias))}
    got = np.asarray(layers.layer_norm(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gelu_matches_torch_exact():
    x = np.random.randn(128).astype(np.float32)
    want = t2n(F.gelu(torch.from_numpy(x)))  # approximate='none'
    got = np.asarray(layers.gelu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def _mha_params_from_torch(m: nn.MultiheadAttention, dim):
    wq, wk, wv = t2n(m.in_proj_weight).reshape(3, dim, dim)
    bq, bk, bv = t2n(m.in_proj_bias).reshape(3, dim)
    return {
        'q': {'w': jnp.asarray(wq.T), 'b': jnp.asarray(bq)},
        'k': {'w': jnp.asarray(wk.T), 'b': jnp.asarray(bk)},
        'v': {'w': jnp.asarray(wv.T), 'b': jnp.asarray(bv)},
        'out': {'w': jnp.asarray(t2n(m.out_proj.weight).T), 'b': jnp.asarray(t2n(m.out_proj.bias))},
    }


@pytest.mark.parametrize('heads', [1, 4])
def test_mha_self_attention_matches_torch(heads):
    dim, B, L = 32, 3, 9
    m = nn.MultiheadAttention(dim, heads, batch_first=True)
    x = np.random.randn(B, L, dim).astype(np.float32)
    want, _ = m(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    p = _mha_params_from_torch(m, dim)
    got = np.asarray(layers.mha(p, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), num_heads=heads))
    np.testing.assert_allclose(got, t2n(want), atol=2e-5)


def test_mha_with_bool_mask_and_padding():
    dim, heads, B, Lq, Lk = 32, 4, 3, 5, 5
    m = nn.MultiheadAttention(dim, heads, batch_first=True)
    q = np.random.randn(B, Lq, dim).astype(np.float32)
    kv = np.random.randn(B, Lk, dim).astype(np.float32)
    # causal-style bool mask (True = masked), keep col 0 always visible
    mask = np.triu(np.ones((Lq, Lk), bool), 1)
    pad = np.zeros((B, Lk), bool)
    pad[0, -2:] = True
    want, _ = m(
        torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
        attn_mask=torch.from_numpy(mask), key_padding_mask=torch.from_numpy(pad),
    )
    p = _mha_params_from_torch(m, dim)
    got = np.asarray(
        layers.mha(
            p, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), num_heads=heads,
            attn_bias=layers.bool_to_bias(jnp.asarray(mask)),
            key_padding_mask=jnp.asarray(pad),
        )
    )
    np.testing.assert_allclose(got, t2n(want), atol=2e-5)


def test_mha_cross_attention_matches_torch():
    dim, heads, B, Lq, Lk = 48, 6, 2, 4, 11
    m = nn.MultiheadAttention(dim, heads, batch_first=True)
    q = np.random.randn(B, Lq, dim).astype(np.float32)
    kv = np.random.randn(B, Lk, dim).astype(np.float32)
    want, _ = m(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))
    p = _mha_params_from_torch(m, dim)
    got = np.asarray(layers.mha(p, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), num_heads=heads))
    np.testing.assert_allclose(got, t2n(want), atol=2e-5)


def test_linear_matches_torch():
    lin = nn.Linear(10, 20)
    x = np.random.randn(4, 10).astype(np.float32)
    want = t2n(lin(torch.from_numpy(x)))
    p = {'w': jnp.asarray(t2n(lin.weight).T), 'b': jnp.asarray(t2n(lin.bias))}
    got = np.asarray(layers.linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dropout_rate_one_returns_zeros():
    """rate>=1.0 must drop everything (ADVICE r2: uint16 threshold wrapped)."""
    import jax
    x = jnp.ones((64,), jnp.float32)
    out = np.asarray(layers.dropout(x, 1.0, jax.random.key(0)))
    assert np.all(out == 0.0) and np.all(np.isfinite(out))


def test_dropout_high_rate_no_wraparound():
    import jax
    x = jnp.ones((4096,), jnp.float32)
    out = np.asarray(layers.dropout(x, 0.9999, jax.random.key(0)))
    assert np.all(np.isfinite(out))
    # keep probability ~1e-4: nearly everything should be dropped
    assert (out != 0).mean() < 0.01


def test_dropout_uint8_bits_unbiased():
    """Pregenerated uint8 bits: drop rate quantizes to round(p*256)/256 and
    the survivor scale uses the QUANTIZED keep rate, so E[out] == E[x]."""
    import jax
    x = jnp.ones((1 << 20,), jnp.float32)
    bits = jax.random.bits(jax.random.key(0), x.shape, jnp.uint8)
    out = np.asarray(layers.dropout(x, 0.1, bits))
    # effective rate 26/256 = 0.1015625
    assert abs((out == 0).mean() - 26 / 256) < 3e-3
    assert abs(out.mean() - 1.0) < 5e-3
    # survivors all share the exact quantized inverse-keep scale
    surv = out[out != 0]
    np.testing.assert_allclose(surv, 1.0 / (1.0 - 26 / 256), rtol=1e-6)
