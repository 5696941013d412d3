"""Whole-encoder Pallas mega-kernel: all transformer blocks in one kernel.

STATUS: measured and REJECTED for production (kept as documented work +
interpret-mode-tested reference). On the real v5e chip at PARSeq-S geometry
(batch 256, bf16, 12 layers) the kernel compiles only at block_b=4 (VMEM
ceiling) and runs 18.96 ms vs the scan path's 18.2 ms. The premise — that
the encoder was HBM-bound between ops — turned out false once decomposed
(experiments/encoder_decomposition.py): XLA's matmuls already run at 83%
of the MXU roofline (8.55 ms for 1.39 TFLOP), attention scores+softmax add
only ~1.3 ms, and the real sink was the exact-erf GELU (~6.5 ms of VPU
time), fixed in ops/layers.py by dtype-adaptive GELU instead. See PERF.md.

Original motivation (kept for the record): keep the residual stream
resident in VMEM across ALL layers:

  grid = (batch_blocks, depth)   # batch-major: depth is the fast axis
  x/out blocks: index (b, l) -> b   -> fetched/flushed once per batch block
  weights:      index (b, l) -> l   -> auto double-buffered per layer

so HBM traffic collapses to one activation read + one write per batch block
plus a weight stream (depth x ~3.5 MB per block program).

Attention avoids head-split relayouts entirely (the round-1 lesson —
64-lane head slices on a 384-lane block force relayouts): Q is masked with
a per-head lane indicator and contracted at full width,

    S_h = (Q * m_h) @ K^T        (m_h zeroes other heads' lanes)
    O   = sum_h softmax(S_h) @ (V * m_h)

which reassembles the merged-head output in natural (rows, D) layout. The
extra contraction width costs ~6x the attention FLOPs but attention is ~5%
of the encoder's total, and every matmul stays MXU-shaped.

Numerics match the scan path: f32 LayerNorm statistics, f32 scores/softmax,
bf16 residual stream (the production compute dtype), exact-erf GELU via an
in-kernel Abramowitz-Stegun rational (Mosaic lowers neither erf nor
dynamic_slice-on-values — both worked around below).

Reference behavior: timm ViT blocks, /root/reference/strhub/models/parseq/
modules.py:128-165 (pre-LN: x += attn(ln(x)); x += mlp(ln(x))).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 — exact at
    bf16 resolution). Mosaic has no erf/erfc lowering, so the exact-form GELU
    is built from this + exp."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x32):
    """Exact-form GELU (torch F.gelu default) on f32 input."""
    return 0.5 * x32 * (1.0 + _erf(x32 * 0.7071067811865476))


def _ln(x32, scale, bias, eps=1e-5):
    """LayerNorm with f32 statistics; x32 is f32 (rows, D)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _encoder_kernel(x_ref, ln1_s, ln1_b, wqkv, bqkv, wo, bo,
                    ln2_s, ln2_b, w1, b1, w2, b2, out_ref,
                    *, num_heads, seq_len):
    l = pl.program_id(1)
    _, rows, D = out_ref.shape
    dh = D // num_heads
    scale = 1.0 / math.sqrt(dh)
    block_b = rows // seq_len

    @pl.when(l == 0)
    def _():
        out_ref[0] = x_ref[0]

    x = out_ref[0]  # bf16 residual stream, VMEM-resident across layers

    # --- attention sublayer -------------------------------------------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)

    def scoped(qkv_ref, attn_acc):
        h = _ln(x.astype(jnp.float32), ln1_s[0], ln1_b[0]).astype(x.dtype)
        qkv_ref[:] = (jnp.dot(h, wqkv[0], preferred_element_type=jnp.float32)
                      .astype(x.dtype) + bqkv[0])

        def image(i, carry):
            # Pallas TC cannot lower dynamic_slice on values; slice the
            # VMEM ref instead (pl.ds on refs lowers fine).
            r = pl.ds(pl.multiple_of(i * seq_len, seq_len), seq_len)
            qi = qkv_ref[r, :D]
            ki = qkv_ref[r, D:2 * D]
            vi = qkv_ref[r, 2 * D:]
            oi = jnp.zeros((seq_len, D), jnp.float32)
            for hd in range(num_heads):
                m = ((lane // dh) == hd).astype(x.dtype)
                s = jax.lax.dot_general((qi * m), ki, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
                oi = oi + jnp.dot(p, vi * m, preferred_element_type=jnp.float32)
            attn_acc[r, :] = oi.astype(x.dtype)
            return carry

        jax.lax.fori_loop(0, block_b, image, 0)
        proj = (jnp.dot(attn_acc[:], wo[0], preferred_element_type=jnp.float32)
                .astype(x.dtype) + bo[0])
        x1 = x + proj
        # --- MLP sublayer ---------------------------------------------------
        h2 = _ln(x1.astype(jnp.float32), ln2_s[0], ln2_b[0]).astype(x.dtype)
        hid = (jnp.dot(h2, w1[0], preferred_element_type=jnp.float32)
               .astype(x.dtype) + b1[0])
        hid = _gelu_exact(hid.astype(jnp.float32)).astype(x.dtype)
        dn = (jnp.dot(hid, w2[0], preferred_element_type=jnp.float32)
              .astype(x.dtype) + b2[0])
        out_ref[0] = x1 + dn

    pl.run_scoped(scoped,
                  qkv_ref=pltpu.VMEM((rows, 3 * D), x.dtype),
                  attn_acc=pltpu.VMEM((rows, D), x.dtype))


def stack_block_params(blocks, dtype=jnp.bfloat16):
    """Depth-stacked block params (models/vit.py init) -> kernel operand dict.

    Weights cast to the compute dtype; LayerNorm scale/bias stay f32 (the
    kernel normalizes in f32). qkv is packed (depth, D, 3D) in q|k|v order.
    """
    attn = blocks['attn']
    wqkv = jnp.concatenate(
        [attn['q']['w'], attn['k']['w'], attn['v']['w']], axis=-1).astype(dtype)
    bqkv = jnp.concatenate(
        [attn['q']['b'], attn['k']['b'], attn['v']['b']], axis=-1).astype(dtype)
    depth = wqkv.shape[0]
    return {
        'ln1_s': blocks['norm1']['scale'].astype(jnp.float32).reshape(depth, 1, -1),
        'ln1_b': blocks['norm1']['bias'].astype(jnp.float32).reshape(depth, 1, -1),
        'wqkv': wqkv,
        'bqkv': bqkv.reshape(depth, 1, -1),
        'wo': attn['out']['w'].astype(dtype),
        'bo': attn['out']['b'].astype(dtype).reshape(depth, 1, -1),
        'ln2_s': blocks['norm2']['scale'].astype(jnp.float32).reshape(depth, 1, -1),
        'ln2_b': blocks['norm2']['bias'].astype(jnp.float32).reshape(depth, 1, -1),
        'w1': blocks['mlp']['fc1']['w'].astype(dtype),
        'b1': blocks['mlp']['fc1']['b'].astype(dtype).reshape(depth, 1, -1),
        'w2': blocks['mlp']['fc2']['w'].astype(dtype),
        'b2': blocks['mlp']['fc2']['b'].astype(dtype).reshape(depth, 1, -1),
    }


@functools.partial(jax.jit, static_argnames=('num_heads', 'block_b', 'interpret',
                                             'vmem_limit_mb'))
def fused_encoder_blocks(op, x, *, num_heads, block_b=8, interpret=False,
                         vmem_limit_mb=None):
    """Run all transformer blocks on x: (B, L, D) -> (B, L, D).

    op: stack_block_params output. B must be divisible by block_b (callers
    pad or pick block_b accordingly). Applies blocks only — patch embed,
    pos embed, and the final LayerNorm remain outside (cheap, XLA-fused).
    """
    B, L, D = x.shape
    depth = op['wqkv'].shape[0]
    if B % block_b:
        raise ValueError(f'batch {B} not divisible by block_b {block_b}')
    rows = block_b * L

    x2 = x.reshape(B // block_b, rows, D)

    def wspec(name):
        arr = op[name]
        return pl.BlockSpec((1, *arr.shape[1:]), lambda b, l: (l, 0, 0),
                            memory_space=pltpu.VMEM)

    names = ['ln1_s', 'ln1_b', 'wqkv', 'bqkv', 'wo', 'bo',
             'ln2_s', 'ln2_b', 'w1', 'b1', 'w2', 'b2']
    kernel = functools.partial(_encoder_kernel, num_heads=num_heads, seq_len=L)
    out = pl.pallas_call(
        kernel,
        grid=(B // block_b, depth),
        in_specs=[pl.BlockSpec((1, rows, D), lambda b, l: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(n) for n in names],
        out_specs=pl.BlockSpec((1, rows, D), lambda b, l: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // block_b, rows, D), x.dtype),
        interpret=interpret,
        compiler_params=None if vmem_limit_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
    )(x2, *[op[n] for n in names])
    return out.reshape(B, L, D)
