"""Fused attention Pallas kernel for the ViT encoder hot path.

The einsum attention path materializes (B, h, L, L) float32 score tensors in
HBM — for PARSeq-S inference at batch 256 that is ~100 MB per layer written
and re-read twice, ~14 GB of HBM traffic across the 12 encoder layers, which
dominated the measured encoder time. With L = 256 the whole per-(batch, head)
problem fits comfortably in VMEM, so a single-block fused kernel (load q/k/v
tiles, compute scores + softmax + output entirely on-chip) removes that
traffic; no streaming flash machinery is needed.

Differentiable via custom_vjp: the backward pass recomputes with the plain
einsum formulation (cheap at these sizes, and XLA fuses it well).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_attention(q, k, v, scale):
    """(BH, L, dh) einsum attention, f32 softmax — ground truth for the kernel."""
    s = jnp.einsum('bqd,bkd->bqk', q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum('bqk,bkd->bqd', p.astype(v.dtype), v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pallas_attention(q, k, v, scale, heads_per_block=2, interpret=False):
    """q, k, v: (BH, L, dh) -> (BH, L, dh)."""
    BH, L, dh = q.shape
    g = heads_per_block
    while BH % g:
        g -= 1

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for i in range(g):  # unrolled: g independent (L, dh) problems
            qi = q_ref[i]
            ki = k_ref[i]
            vi = v_ref[i]
            s = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vi.dtype)
            o_ref[i] = jnp.dot(p, vi, preferred_element_type=jnp.float32).astype(o_ref.dtype)

    spec = pl.BlockSpec((g, L, dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(BH // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * L * L * dh,
            bytes_accessed=4 * BH * L * dh * q.dtype.itemsize,
            transcendentals=BH * L * L,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale):
    """Fused self/cross attention (no mask). q/k/v: (BH, L, dh)."""
    return _pallas_attention(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _pallas_attention(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _reference_attention(q, k, v, scale), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def _pallas_attention_nosplit(q, k, v, num_heads, scale, batch_block=2, interpret=False):
    """Fused attention on the un-split (B, L, D) layout.

    Avoids the (B, L, h, dh) <-> (B, h, L, dh) transposes around the kernel
    (XLA cannot fuse transposes into a pallas_call, so they materialize ~3
    full activation tensors per layer). Heads are sliced as lane sub-ranges
    inside the kernel; the head loop is unrolled.
    """
    B, L, D = q.shape
    dh = D // num_heads
    bb = batch_block
    while B % bb:
        bb -= 1

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for b in range(bb):
            for i in range(num_heads):
                sl = slice(i * dh, (i + 1) * dh)
                qi = q_ref[b, :, sl]
                ki = k_ref[b, :, sl]
                vi = v_ref[b, :, sl]
                s = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vi.dtype)
                o_ref[b, :, sl] = jnp.dot(p, vi, preferred_element_type=jnp.float32
                                          ).astype(o_ref.dtype)

    spec = pl.BlockSpec((bb, L, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * L * L * dh,
            bytes_accessed=4 * B * L * D * q.dtype.itemsize,
            transcendentals=B * num_heads * L * L,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_nosplit(q, k, v, num_heads, scale):
    """Fused multi-head self attention on (B, L, D), no mask."""
    return _pallas_attention_nosplit(q, k, v, num_heads, scale)


def _reference_nosplit(q, k, v, num_heads, scale):
    B, L, D = q.shape
    dh = D // num_heads

    def split(x):
        return x.reshape(B, L, num_heads, dh).transpose(0, 2, 1, 3)

    s = jnp.einsum('bhqd,bhkd->bhqk', split(q), split(k),
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), split(v))
    return o.transpose(0, 2, 1, 3).reshape(B, L, D)


def _ns_fwd(q, k, v, num_heads, scale):
    return _pallas_attention_nosplit(q, k, v, num_heads, scale), (q, k, v)


def _ns_bwd(num_heads, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _reference_nosplit(q, k, v, num_heads, scale), q, k, v)
    return vjp(g)


fused_attention_nosplit.defvjp(_ns_fwd, _ns_bwd)


# Kernel gate. Measured on v5e-1, batch 256 (pipelined / slope-timed):
#   PARSeq encoder, L=128:  einsum 20.4 ms/batch, no-split kernel 24.1
#     -> XLA's fused einsum chain wins at short L; kernel off.
#   ViTSTR encoder, L=197:  12-block scan einsum 33.5 ms, kernel 21.3;
#     single sublayer 1.54 vs 0.85 ms (experiments/vitstr_attention_ab.py)
#     -> the einsum path's materialized (B, h, L, L) f32 scores pad the
#        minor (key) dim to 256 lanes, so every L in 129..256 pays L=256's
#        HBM traffic; the kernel keeps scores in VMEM. Kernel on.
# The crossover is gated on L: einsum below KERNEL_MIN_LEN, kernel at or
# above it. USE_KERNEL=True forces the kernel everywhere (experiments).
USE_KERNEL = False
KERNEL_MIN_LEN = 192


import contextlib


@contextlib.contextmanager
def force_einsum():
    """Temporarily route every encoder_self_attention through the einsum
    path (experiments/bench A/Bs; replaces hand-rolled KERNEL_MIN_LEN
    save/restore at call sites)."""
    global KERNEL_MIN_LEN
    old = KERNEL_MIN_LEN
    KERNEL_MIN_LEN = 10 ** 9
    try:
        yield
    finally:
        KERNEL_MIN_LEN = old


def encoder_self_attention(p, x, num_heads, *, use_kernel=None,
                           dropout_rate=0.0, rng=None):
    """Drop-in fused replacement for layers.mha(p, x, x, x) with no mask.

    Falls back to the einsum path on non-TPU backends, and — since the
    pallas kernel does not implement attention-probability dropout (torch
    MultiheadAttention training semantics) — whenever dropout is active.
    """
    from parseq_tpu.ops import layers

    if dropout_rate > 0.0 and rng is not None:
        return layers.mha(p, x, x, x, num_heads=num_heads,
                          dropout_rate=dropout_rate, rng=rng)

    # Perf notes (v5e-1, PARSeq-S encoder, batch 256, pipelined ms/batch):
    #   separate q/k/v projections + einsum attention (this path)   20.4
    #   merged (D,3D) qkv matmul + einsum attention                 23.5
    #   merged qkv + pallas no-split kernel                         24.1
    # XLA's default lowering wins at L=128; local rewrites that looked
    # like bandwidth savings all measured slower. At L >= KERNEL_MIN_LEN
    # the padded-score traffic flips the balance (see gate above).
    if use_kernel is None:
        use_kernel = USE_KERNEL or x.shape[1] >= KERNEL_MIN_LEN
    if not use_kernel or jax.default_backend() != 'tpu':
        if USE_FLASH_BWD and jax.default_backend() == 'tpu':
            return _mha_flashbwd(p, x, num_heads)
        return layers.mha(p, x, x, x, num_heads=num_heads)
    D = x.shape[-1]
    dh = D // num_heads
    q = layers.linear(p['q'], x)
    k = layers.linear(p['k'], x)
    v = layers.linear(p['v'], x)
    o = fused_attention_nosplit(q, k, v, num_heads, 1.0 / math.sqrt(dh))
    return layers.linear(p['out'], o)


# Backward-only pallas kernel (ops/flash_bwd.py): forward stays the XLA
# einsum path above; the VJP would avoid XLA's materialized (B, h, L, L)
# f32 softmax-gradient chain (~12 ms of the bs=384 encoder grad).
# STATUS: measured and REJECTED on v5e-1 — encoder grad 111.6 ms vs
# 100.5 ms XLA (288 small grid programs + the pallas optimization barrier
# lose more than the materialization saves), and the on-chip lowering of
# the transposed dot_generals additionally produced wrong gradients
# (interpret mode is exact to 4e-7 — a Mosaic contraction-layout issue).
# Kept for future block-level work; default off.
USE_FLASH_BWD = False


def _mha_flashbwd(p, x, num_heads):
    from parseq_tpu.ops import layers
    from parseq_tpu.ops.flash_bwd import attention_flashbwd

    B, L, D = x.shape
    dh = D // num_heads
    if L % 8 or dh % 8:
        return layers.mha(p, x, x, x, num_heads=num_heads)

    def split(t):
        return t.reshape(B, L, num_heads, dh).transpose(0, 2, 1, 3)

    q = split(layers.linear(p['q'], x))
    k = split(layers.linear(p['k'], x))
    v = split(layers.linear(p['v'], x))
    o = attention_flashbwd(q, k, v, 1.0 / math.sqrt(dh))
    o = o.transpose(0, 2, 1, 3).reshape(B, L, D)
    return layers.linear(p['out'], o)
