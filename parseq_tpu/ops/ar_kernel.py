"""Fused greedy AR decode loop as a single Pallas kernel (dec_depth == 1).

The scan-based AR decode (models/parseq.py:ar_decode) costs ~0.4 ms per step
at batch 256 on v5e-1 — 26 sequential iterations of ~40 small XLA ops. This
kernel runs the ENTIRE loop on-chip per batch block: weights and the memory
K/V block stay resident in VMEM; each step is a handful of small matmuls.

TPU-friendly formulations replace gather/scatter-style ops:
  * token embedding lookup  -> one-hot (lane iota == id) @ padded emb table
  * per-head score reduction-> elementwise q*k then @ head-indicator matrix G
  * per-head prob expansion -> probs @ G^T
  * class argmax            -> lane-axis argmax over the (padded) head output

All paddings (embedding rows, head columns, head count) are to 128 lanes,
done by the wrapper. Inference-only (no VJP); greedy semantics identical to
ar_decode (verified argmax-identical in tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parseq_tpu.ops import layers

LANE = 128


def _erf(x):
    """Polynomial erf (Abramowitz & Stegun 7.1.26, |err| < 1.5e-7): Mosaic has
    no erf/erfc lowering; this is exact to well below bf16 resolution."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x.astype(jnp.float32) * 0.7071067811865476))


def _ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(mem_k_ref, mem_v_ref,  # (M, bb, D) — keys-first layout so all
            # broadcasts insert LEADING unit dims (Mosaic can't shape-cast a
            # middle unit dim for non-128-multiple D)
            emb_ref,               # (LANE, D)   sqrt(D)*embedding, padded rows
            pos_add_ref,           # (n, D)      content positional rows (row0=0)
            q_base_ref,            # (n, D)      pos_queries (query stream input)
            q_proj_ref,            # (n, D)      self_q(norm_q(pos_queries)) + bias
            wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,      # self-attn
            cq_ref, cqb_ref, co_ref, cob_ref,                    # cross-attn q/out
            w1_ref, b1_ref, w2_ref, b2_ref,                      # MLP
            ln_ref,                # (6, D): norm_c s/b, norm1 s/b, norm2 s/b
            lnf_ref,               # (2, D): final decoder norm s/b
            wh_ref, bh_ref,        # head (D, LANE), (1, LANE) (pad cols = -1e9 bias)
            G_ref, GT_ref,         # (D, LANE) head-indicator and its transpose
            logits_ref,            # out: (n, bb, LANE) — steps-first (leading writes)
            k_cache_ref, v_cache_ref,  # VMEM scratch: (n, bb, D)
            *, n, heads, dh, bos_id):
    M, bb, D = mem_k_ref.shape
    inv_sqrt_dh = 1.0 / math.sqrt(dh)

    mem_k = mem_k_ref[...]
    mem_v = mem_v_ref[...]
    G = G_ref[...]

    def body(i, tok):  # tok: (bb, LANE) one-hot f32 of the entering token
        # ---- content row: embed previous token, add pos, norm_c, project K/V
        emb = _dot(tok.astype(emb_ref.dtype), emb_ref[...])  # (bb, D)
        pos = pos_add_ref[pl.ds(i, 1), :]  # (1, D)
        cn = _ln(emb + pos.astype(jnp.float32), ln_ref[0:1, :], ln_ref[1:2, :])
        cn = cn.astype(mem_k.dtype)
        k_new = _dot(cn, wk_ref[...]) + bk_ref[...]
        v_new = _dot(cn, wv_ref[...]) + bv_ref[...]
        k_cache_ref[pl.ds(i, 1)] = k_new.astype(k_cache_ref.dtype)[None]
        v_cache_ref[pl.ds(i, 1)] = v_new.astype(v_cache_ref.dtype)[None]
        k_cache = k_cache_ref[...]
        v_cache = v_cache_ref[...]

        # ---- self-attention: single query (precomputed projection) over cache
        qh = q_proj_ref[pl.ds(i, 1), :]  # (1, D) f32-storable
        # scores[k, b, h] = sum_{d in head h} q[d] * k_cache[k, b, d].
        # f32 throughout: an f32 elementwise product of bf16-valued inputs is
        # exactly the MXU's bf16xbf16 product, and the f32 G-matmul is an f32
        # segment-sum — this reproduces the exact scan's q@k^T numerics (the
        # bf16 version rounded each product, diverging greedy picks).
        prod = k_cache.astype(jnp.float32) * qh[None].astype(jnp.float32)  # (n, bb, D)
        scores = _dot(prod.reshape(n * bb, D), G.astype(jnp.float32)) * inv_sqrt_dh
        scores = scores.reshape(n, bb, LANE)
        key_idx = jax.lax.broadcasted_iota(jnp.int32, (n, bb, LANE), 0)
        scores = jnp.where(key_idx <= i, scores, -1e9)
        smax = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - smax)
        probs = e / jnp.sum(e, axis=0, keepdims=True)  # (n, bb, LANE) f32
        pl_lanes = _dot(probs.reshape(n * bb, LANE), GT_ref[...].astype(jnp.float32))
        pl_lanes = pl_lanes.reshape(n, bb, D)
        sa = jnp.sum(pl_lanes * v_cache.astype(jnp.float32), axis=0)  # (bb, D)
        sa = _dot(sa.astype(jnp.bfloat16), wo_ref[...]) + bo_ref[...]
        tgt = q_base_ref[pl.ds(i, 1), :].astype(jnp.float32) + sa  # (bb, D)

        # ---- cross-attention to memory (K/V pre-projected outside)
        cqv = _ln(tgt, ln_ref[2:3, :], ln_ref[3:4, :])
        cq = _dot(cqv.astype(jnp.bfloat16), cq_ref[...]) + cqb_ref[...]  # (bb, D)
        # f32 score path, same reasoning as self-attention above
        prod2 = mem_k.astype(jnp.float32) * cq[None]  # (M, bb, D)
        scores2 = _dot(prod2.reshape(M * bb, D), G.astype(jnp.float32)) * inv_sqrt_dh
        scores2 = scores2.reshape(M, bb, LANE)
        smax2 = jnp.max(scores2, axis=0, keepdims=True)
        e2 = jnp.exp(scores2 - smax2)
        probs2 = e2 / jnp.sum(e2, axis=0, keepdims=True)
        p2 = _dot(probs2.reshape(M * bb, LANE),
                  GT_ref[...].astype(jnp.float32)).reshape(M, bb, D)
        ca = jnp.sum(p2 * mem_v.astype(jnp.float32), axis=0)  # (bb, D)
        ca = _dot(ca.astype(jnp.bfloat16), co_ref[...]) + cob_ref[...]
        tgt = tgt + ca

        # ---- MLP
        h = _ln(tgt, ln_ref[4:5, :], ln_ref[5:6, :])
        h = _dot(h.astype(jnp.bfloat16), w1_ref[...]) + b1_ref[...]
        h = _gelu_exact(h)
        h = _dot(h.astype(jnp.bfloat16), w2_ref[...]) + b2_ref[...]
        tgt = tgt + h

        # ---- final norm + head + greedy pick
        out = _ln(tgt, lnf_ref[0:1, :], lnf_ref[1:2, :])
        logits = _dot(out.astype(jnp.bfloat16), wh_ref[...]) + bh_ref[...]  # (bb, LANE)
        logits_ref[pl.ds(i, 1)] = logits[None].astype(logits_ref.dtype)
        nxt = jnp.argmax(logits, axis=-1, keepdims=True)  # (bb, 1)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (bb, LANE), 1)
        return (lane_ids == nxt).astype(jnp.float32)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (bb, LANE), 1)
    tok0 = (lane_ids == bos_id).astype(jnp.float32)
    k_cache_ref[...] = jnp.zeros((n, bb, D), k_cache_ref.dtype)
    v_cache_ref[...] = jnp.zeros((n, bb, D), v_cache_ref.dtype)
    jax.lax.fori_loop(0, n, body, tok0)


def ar_decode_fused(params, cfg, memory, *, batch_block=8, interpret=False):
    """Drop-in greedy AR decode via the fused kernel. memory: (B, M, D) bf16.
    Returns logits (B, num_steps, num_classes) float32."""
    assert cfg.dec_depth == 1
    lp = params['decoder']['layers'][0]
    B, M, D = memory.shape
    n = cfg.num_steps
    h = cfg.dec_num_heads
    dh = D // h
    bb = batch_block
    while B % bb:
        bb -= 1
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    mem = memory.astype(bf16)
    # keys-first (M, B, D) layout — see _kernel docstring
    mem_k = layers.linear(lp['cross_attn']['k'], mem).astype(bf16).transpose(1, 0, 2)
    mem_v = layers.linear(lp['cross_attn']['v'], mem).astype(bf16).transpose(1, 0, 2)

    # Embedding table, sqrt(D)-scaled, padded to LANE rows.
    emb = math.sqrt(D) * params['text_embed']['w']
    emb_pad = jnp.zeros((LANE, D), bf16).at[: emb.shape[0]].set(emb.astype(bf16))

    pos_q = params['pos_queries'][0, :n].astype(f32)  # (n, D)
    pos_add = jnp.zeros((n, D), f32).at[1:].set(pos_q[: n - 1])

    # Query-side constants: norm_q then self-attn q projection (+bias).
    qn = layers.layer_norm(lp['norm_q'], pos_q)
    q_proj = (qn @ lp['self_attn']['q']['w'] + lp['self_attn']['q']['b']).astype(f32)

    def wb(p):
        return p['w'].astype(bf16), p['b'].astype(f32).reshape(1, -1)

    wk, bk = wb(lp['self_attn']['k'])
    wv, bv = wb(lp['self_attn']['v'])
    wo, bo = wb(lp['self_attn']['out'])
    cq, cqb = wb(lp['cross_attn']['q'])
    co, cob = wb(lp['cross_attn']['out'])
    w1, b1 = wb(lp['linear1'])
    w2, b2 = wb(lp['linear2'])

    ln = jnp.stack([
        lp['norm_c']['scale'], lp['norm_c']['bias'],
        lp['norm1']['scale'], lp['norm1']['bias'],
        lp['norm2']['scale'], lp['norm2']['bias'],
    ]).astype(f32)
    lnf = jnp.stack([params['decoder']['norm']['scale'],
                     params['decoder']['norm']['bias']]).astype(f32)

    C = cfg.num_classes
    wh = jnp.zeros((D, LANE), bf16).at[:, :C].set(params['head']['w'].astype(bf16))
    bh = jnp.full((1, LANE), -1e9, f32).at[0, :C].set(params['head']['b'].astype(f32))

    # Head-indicator matrix: G[d, head_of(d)] = 1.
    d_idx = jnp.arange(D)
    Gm = (d_idx[:, None] // dh == jnp.arange(LANE)[None, :]).astype(bf16)
    GmT = Gm.T

    blocked = pl.BlockSpec((M, bb, D), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, n=n, heads=h, dh=dh, bos_id=cfg.bos_id)
    consts = [emb_pad, pos_add, pos_q, q_proj,
              wk, bk, wv, bv, wo, bo, cq, cqb, co, cob, w1, b1, w2, b2,
              ln, lnf, wh, bh, Gm, GmT]
    logits = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[blocked, blocked] + [full(c.shape) for c in consts],
        out_specs=pl.BlockSpec((n, bb, LANE), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B, LANE), f32),
        scratch_shapes=[
            pltpu.VMEM((n, bb, D), bf16),
            pltpu.VMEM((n, bb, D), bf16),
        ],
        interpret=interpret,
    )(mem_k, mem_v, *consts)
    return logits.transpose(1, 0, 2)[:, :, :C]
