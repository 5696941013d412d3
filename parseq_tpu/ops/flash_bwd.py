"""Attention with a Pallas BACKWARD kernel (forward stays on XLA).

Motivation (backward decomposition, PERF.md): the PARSeq-S encoder grad is
~99 ms of the 137.8 ms training step, and ablation shows ~12 ms of it is
the softmax backward chain — XLA materializes the (B, h, L, L) f32
probability tensor and its two gradient intermediates to HBM per layer.
The forward needs no kernel (XLA flash-fuses it; measured round 1), so
this module keeps the einsum forward and supplies a custom VJP whose
backward recomputes scores/probs tile-wise in VMEM and emits dQ/dK/dV
directly:

    dV = P^T dO
    dP = dO V^T
    dS = P * (dP - rowsum(dP * P))
    dQ = scale * dS K,   dK = scale * dS^T Q

At STR shapes (L = 128 tokens, dh = 64) one (L, L) f32 score tile is 64 KB
— a whole (batch-block, head) backward fits VMEM with room to spare.

Scope: encoder self-attention only (no mask, no dropout — the PARSeq/ViTSTR
encoder applies neither); the decoder keeps XLA autodiff (it needs masks +
prob dropout and is bwd-cheap already).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_fwd_ref(q, k, v, scale):
    """Plain XLA forward: q/k/v (B, h, L, dh) -> out (B, h, L, dh)."""
    s = jnp.einsum('bhqd,bhkd->bhqk', q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', p.astype(q.dtype), v)


def _one_head_bwd(q, k, v, do, scale):
    """Single (L, dh) attention backward, all f32 in VMEM."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale  # (L, L)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)          # (L, dh)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)          # (L, L)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)                       # (L, 1)
    ds = p * (dp - delta)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale  # (L, dh)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale  # (L, dh)
    return dq, dk, dv


def _bwd_pallas(q, k, v, do, scale, *, batch_block=8, interpret=False):
    B, h, L, dh = q.shape
    bb = math.gcd(batch_block, B)
    grid = (B // bb, h)
    spec = pl.BlockSpec((bb, 1, L, dh), lambda b, j: (b, j, 0, 0))

    def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
        qb = q_ref[...].astype(jnp.float32)   # (bb, 1, L, dh)
        kb = k_ref[...].astype(jnp.float32)
        vb = v_ref[...].astype(jnp.float32)
        dob = do_ref[...].astype(jnp.float32)
        dqs, dks, dvs = [], [], []
        for i in range(bb):
            dq, dk, dv = _one_head_bwd(qb[i, 0], kb[i, 0], vb[i, 0], dob[i, 0], scale)
            dqs.append(dq)
            dks.append(dk)
            dvs.append(dv)
        dq_ref[...] = jnp.stack(dqs)[:, None].astype(dq_ref.dtype)
        dk_ref[...] = jnp.stack(dks)[:, None].astype(dk_ref.dtype)
        dv_ref[...] = jnp.stack(dvs)[:, None].astype(dv_ref.dtype)

    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def attention_flashbwd(q, k, v, scale, interpret=False):
    """Encoder self-attention (no mask/dropout) with a Pallas backward.

    q/k/v: (B, h, L, dh). Forward is XLA verbatim; only the VJP differs."""
    return _attn_fwd_ref(q, k, v, scale)


def _fwd(q, k, v, scale, interpret):
    return _attn_fwd_ref(q, k, v, scale), (q, k, v)


def _bwd(scale, interpret, res, dout):
    q, k, v = res
    dq, dk, dv = _bwd_pallas(q, k, v, dout.astype(q.dtype), scale,
                             interpret=interpret)
    return dq, dk, dv


attention_flashbwd.defvjp(_fwd, _bwd)
