"""Core neural-net layers as pure functions over parameter pytrees.

Conventions (TPU-first):
  * Weights are stored in right-multiply layout: ``y = x @ w + b`` with
    ``w.shape == (in_dim, out_dim)`` — i.e. the transpose of torch's
    ``nn.Linear.weight``. This keeps matmuls in the natural MXU orientation.
  * Attention masks are *additive float biases* (0 = allowed, NEG_INF =
    disallowed). ``bool_to_bias`` converts torch-convention boolean masks
    (True = masked) — reference semantics per ``nn.MultiheadAttention``
    used at /root/reference/strhub/models/parseq/modules.py:33-34.
  * LayerNorm and softmax accumulate in float32 regardless of compute dtype.
  * Parameters are kept in float32 and cast to the activation dtype inside
    each layer, so a single param pytree serves both f32 and bf16 compute.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # finite "minus infinity": avoids NaN rows in fully-masked softmax


# ---------------------------------------------------------------------------
# Initializers (matching the reference's schemes, models/utils.py:107-125)
# ---------------------------------------------------------------------------


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal on [-2*std, 2*std], like torch.nn.init.trunc_normal_."""
    return (std * jax.random.truncated_normal(key, -2.0, 2.0, shape)).astype(dtype)


def kaiming_normal_conv(key, shape, dtype=jnp.float32):
    """He-normal, fan_out/relu, for conv kernels stored as (kh, kw, cin, cout)."""
    kh, kw, _, cout = shape
    std = math.sqrt(2.0 / (cout * kh * kw))
    return (std * jax.random.normal(key, shape)).astype(dtype)


def linear_init(key, in_dim, out_dim, *, std=0.02, bias=True):
    p = {'w': trunc_normal(key, (in_dim, out_dim), std)}
    if bias:
        p['b'] = jnp.zeros((out_dim,), jnp.float32)
    return p


def layer_norm_init(dim):
    return {'scale': jnp.ones((dim,), jnp.float32), 'bias': jnp.zeros((dim,), jnp.float32)}


def mha_init(key, dim, *, kdim=None, vdim=None):
    """Multi-head attention params: separate q/k/v/out projections.

    Equivalent capacity/layout to torch nn.MultiheadAttention's packed
    in_proj (split on conversion). Torch init uses xavier_uniform for
    in_proj; we match that (gain=1).
    """
    kdim = dim if kdim is None else kdim
    vdim = dim if vdim is None else vdim
    kq, kk, kv, ko = jax.random.split(key, 4)

    def xavier(key, fan_in, fan_out):
        a = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -a, a)

    return {
        'q': {'w': xavier(kq, dim, dim), 'b': jnp.zeros((dim,), jnp.float32)},
        'k': {'w': xavier(kk, kdim, dim), 'b': jnp.zeros((dim,), jnp.float32)},
        'v': {'w': xavier(kv, vdim, dim), 'b': jnp.zeros((dim,), jnp.float32)},
        'out': {'w': xavier(ko, dim, dim), 'b': jnp.zeros((dim,), jnp.float32)},
    }


def mlp_init(key, dim, hidden_dim, *, out_dim=None, std=0.02):
    k1, k2 = jax.random.split(key)
    out_dim = dim if out_dim is None else out_dim
    return {
        'fc1': linear_init(k1, dim, hidden_dim, std=std),
        'fc2': linear_init(k2, hidden_dim, out_dim, std=std),
    }


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------


def linear(p, x):
    if 'w_q' in p:  # int8 serving path (ops/quant.py) — same call sites
        from parseq_tpu.ops.quant import int8_linear

        return int8_linear(p, x)
    w = p['w'].astype(x.dtype)
    y = x @ w
    if 'b' in p:
        y = y + p['b'].astype(x.dtype)
    return y


def layer_norm(p, x, *, eps=1e-5):
    """LayerNorm over the last axis; statistics in float32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p['scale'] + p['bias']
    return y.astype(dtype)


def gelu(x):
    """GELU, dtype-adaptive: exact-erf form at f32, tanh form at bf16.

    torch F.gelu defaults to the exact erf form (approximate='none'), which
    we match exactly for f32 compute (parity tests vs torch twins). At bf16
    the tanh approximation is numerically invisible — its max deviation from
    the exact form is 5.0e-4 on [-6, 6], 31x SMALLER than bf16's own
    quantization error of the exact values (1.56e-2) — while XLA's erf
    lowering costs ~6.5 ms of VPU time per 256-batch across the 12 encoder
    layers vs ~0 for tanh (measured: experiments/gelu_bench.py; MLP sublayer
    13.2 -> 6.6 ms, whole encoder 18.2 -> ~11.7 ms).
    """
    exact = x.dtype != jnp.bfloat16
    return jax.nn.gelu(x, approximate=not exact)


def dropout(x, rate, rng=None):
    """Inverted dropout. Identity when rng is None (eval) or rate == 0.

    Masks come from a uint16-bits threshold compare instead of
    bernoulli's f32-uniform path: half the generated-bits traffic and no
    int->float convert, with the drop probability exact to 2^-16
    (measured ~2 ms/step at PARSeq-S bs=384; dropout only needs iid bits).

    `rng` may instead be a PREGENERATED uint16 bits array of x's shape:
    RngBitGenerator lowers poorly under vmap (one serialized call per
    lane), so callers that vmap dropout-bearing code can draw all lanes'
    bits in one call outside and pass per-lane slices here (see
    models/parseq.py multi_perm_loss bulk-bits path).
    """
    if rng is None or rate == 0.0:
        return x
    if rate >= 1.0:
        # everything dropped; the threshold compare below would wrap
        # (round(1.0*65536) = 65536 -> 0 in uint16) and keep everything at 1/0.
        return jnp.zeros_like(x)
    if getattr(rng, 'dtype', None) == jnp.uint8:
        # Pregenerated uint8 bits (half the bits traffic of uint16). The
        # drop probability quantizes to thr/256 and the inverse scale uses
        # the QUANTIZED keep rate, so inverted dropout stays exactly
        # unbiased (rate 0.1 -> effective 0.1016).
        thr8 = min(int(round(rate * 256.0)), 255)
        if thr8 == 0:
            # rate < 1/512 quantizes to a silent no-op at 8 bits; callers
            # must generate uint16 bits instead (parseq.py gates on this).
            raise ValueError(
                f'dropout rate {rate} is not representable in uint8 bulk '
                f'bits (round(rate*256) == 0); pass uint16 bits')
        keep_q = 1.0 - thr8 / 256.0
        return jnp.where(rng >= thr8, x / keep_q, 0).astype(x.dtype)
    keep = 1.0 - rate
    thr = min(int(round(rate * 65536.0)), 65535)
    if getattr(rng, 'dtype', None) == jnp.uint16:
        bits = rng
    else:
        bits = jax.random.bits(rng, x.shape, jnp.uint16)
    return jnp.where(bits >= thr, x / keep, 0).astype(x.dtype)


def bool_to_bias(mask, dtype=jnp.float32):
    """torch-convention boolean mask (True = masked) -> additive bias."""
    return jnp.where(mask, jnp.asarray(NEG_INF, dtype), jnp.asarray(0, dtype))


def attention(q, k, v, *, bias=None, dropout_rate=0.0, rng=None):
    """Scaled dot-product attention. q: (..., h, Lq, dh), k/v: (..., h, Lk, dh).

    Softmax in float32. `bias` broadcasts against (..., h, Lq, Lk).
    """
    dh = q.shape[-1]
    scores = jnp.einsum('...qd,...kd->...qk', q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(dh))
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    # cast before the (train-only) prob dropout so the mask/select runs on
    # half-width data; eval numerics unchanged (the cast happened anyway).
    probs = dropout(probs.astype(q.dtype), dropout_rate, rng)
    return jnp.einsum('...qk,...kd->...qd', probs, v)


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def mha(p, q, k, v, *, num_heads, attn_bias=None, key_padding_mask=None, dropout_rate=0.0, rng=None):
    """Multi-head attention matching torch nn.MultiheadAttention semantics.

    q: (B, Lq, D); k, v: (B, Lk, Dk)/(B, Lk, Dv).
    attn_bias: additive, broadcastable to (B, h, Lq, Lk) — accepts (Lq, Lk),
    (B, Lq, Lk), or full rank-4.
    key_padding_mask: bool (B, Lk), True = ignore that key.
    """
    qh = _split_heads(linear(p['q'], q), num_heads)
    kh = _split_heads(linear(p['k'], k), num_heads)
    vh = _split_heads(linear(p['v'], v), num_heads)

    bias = None
    if attn_bias is not None:
        b = attn_bias
        while b.ndim < 4:
            b = b[None]
        bias = b
    if key_padding_mask is not None:
        kp = bool_to_bias(key_padding_mask)[:, None, None, :]  # (B, 1, 1, Lk)
        bias = kp if bias is None else bias + kp

    out = attention(qh, kh, vh, bias=bias, dropout_rate=dropout_rate, rng=rng)
    return linear(p['out'], _merge_heads(out))


def mlp(p, x, *, act=gelu, dropout_rate=0.0, rng=None):
    """fc1 -> act -> (dropout) -> fc2."""
    h = act(linear(p['fc1'], x))
    h = dropout(h, dropout_rate, rng)
    return linear(p['fc2'], h)


def embedding_init(key, num_embeddings, dim, std=0.02):
    return {'w': trunc_normal(key, (num_embeddings, dim), std)}


def embedding(p, ids, dtype=jnp.float32):
    return p['w'].astype(dtype)[ids]


# Convenience: split a PRNG key into a dict of named keys.
def split_rngs(key, names):
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


remat = partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
