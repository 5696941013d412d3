#!/usr/bin/env python
"""Encoder/decoder boundary-split train step (round 3, follow-up to the
decoder_train_decomposition finding).

Premise (later DISPROVEN — the motivating "7.25 ms at bs=96 vs 13.1 ms
at bs=384" decoder numbers were per-call relay timing artifacts; honest
slope timing shows the decoder piece prefers SMALL batch, 4x3.29 vs
18.2 ms — see decoder_train_decomposition.py and PERF.md): split the
step at the memory boundary so each side runs at its preferred batch
size:

  fwd:  scan over m microbatches, each encoder fwd under jax.checkpoint
        -> memory (B, T, D) materialized in HBM (bs=384: ~37 MB bf16)
  loss: decoder + head + CE at FULL batch
  bwd:  decoder backward at full batch -> d_memory; reverse scan
        recomputes each encoder microbatch and runs its backward with
        d_memory_i (checkpoint gives this for free)

Gradients are IDENTICAL to the production scanned step when dropout is
off, provided the per-microbatch equal-weight loss normalization is
reproduced (production averages per-microbatch means, DDP semantics);
with dropout the masks differ (full-batch draw vs per-microbatch fold)
but are elementwise-iid either way.

Measures jax.grad per effective-bs=384 batch on the real chip:
  production scanned (m=4, remat on)      [the 102 ms step's grad core]
  split m=4, inner per-block remat ON
  split m=4, inner per-block remat OFF    (outer checkpoint only)
  split m=2 / m=8 best-inner variants
plus a numerical-identity check (dropout off) split vs production.
"""

import argparse
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq


def split_loss(params, cfg, images, tgt_ids, perms, *, dtype, rng, m,
               outer_ckpt=True):
    """Boundary-split multi-perm loss: scanned encoder microbatches,
    full-batch decode. Loss = mean over microbatches of per-microbatch
    mean CE (matches steps.py _grads_scanned equal-weight semantics).

    outer_ckpt=True re-runs the whole encoder fwd in the reverse scan —
    combined with inner per-block remat that is THREE encoder forwards
    (measured +23 ms vs production). outer_ckpt=False lets the scan save
    the per-block remat residuals (same footprint as the bs=384 remat
    step) so the reverse scan goes straight to the small-batch backward:
    two forwards total, like production."""
    B = images.shape[0]
    mb = B // m

    def enc_one(p, imgs):
        return parseq.encode(p, cfg, imgs.astype(dtype))

    enc_ckpt = jax.checkpoint(enc_one) if outer_ckpt else enc_one
    imgs_mb = images.reshape(m, mb, *images.shape[1:])
    _, mems = jax.lax.scan(lambda c, im: (c, enc_ckpt(params, im)), None, imgs_mb)
    memory = mems.reshape(B, *mems.shape[2:])

    tgt_in = tgt_ids[:, :-1]
    tgt_out = tgt_ids[:, 1:]
    padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)
    content_bias, query_bias = jax.vmap(parseq.perm_attn_masks)(perms)
    K = perms.shape[0]

    def decode_one(cb, qb, r):
        out = parseq.decode(params, cfg, tgt_in, memory, query_bias=qb,
                            content_bias=cb, padding_mask=padding_mask,
                            dtype=dtype, drop=cfg.dropout, rng=r)
        return parseq.head(params, out)

    if rng is None:
        logits = jax.vmap(decode_one, in_axes=(0, 0, None))(content_bias, query_bias, None)
    else:
        rngs = jax.random.split(rng, K)
        logits = jax.vmap(decode_one)(content_bias, query_bias, rngs)

    base_valid = tgt_out != cfg.pad_id
    eos_pos = tgt_out == cfg.eos_id
    k_idx = jnp.arange(K)[:, None, None]
    valid = base_valid[None] & ((k_idx < 2) | ~eos_pos[None])  # (K, B, L-1)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
    nll = -jnp.take_along_axis(logp, tgt_safe[None, ..., None].repeat(K, 0), axis=-1)[..., 0]

    # Per-microbatch equal weighting: mean_i [ sum_mb(nll*valid) / numel_i ]
    nv = (nll * valid).reshape(K, m, mb, -1)
    v = valid.reshape(K, m, mb, -1)
    numel_i = jnp.sum(v, axis=(0, 2, 3))  # (m,)
    loss_i = jnp.sum(nv, axis=(0, 2, 3)) / jnp.maximum(numel_i, 1)
    return jnp.mean(loss_i)


def prod_scanned_grads(params, cfg, images, tgt_ids, perms, *, dtype, rng, m):
    """steps.py _grads_scanned core: scan of full per-microbatch loss grads."""
    B = images.shape[0]
    mb = B // m
    xs = {'im': images.reshape(m, mb, *images.shape[1:]),
          'tgt': tgt_ids.reshape(m, mb, -1)}
    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)

    def lf(p, im, tgt, r):
        loss, _ = parseq.multi_perm_loss(p, cfg, im, tgt, perms, dtype=dtype, rng=r)
        return loss

    def body(carry, x):
        g_acc, i = carry
        r = None if rng is None else jax.random.fold_in(rng, i)
        g = jax.grad(lf)(params, x['im'], x['tgt'], r)
        g_acc = jax.tree.map(lambda a, b: a + b.astype(jnp.float32), g_acc, g)
        return (g_acc, i + 1), None

    (g_sum, _), _ = jax.lax.scan(body, (zeros, jnp.zeros((), jnp.int32)), xs, length=m)
    return jax.tree.map(lambda g: g / m, g_sum)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--outer', action='store_true',
                    help='also time the (measured-worse) outer-ckpt variants')
    args = ap.parse_args()
    base = parseq.PARSeqConfig(num_tokens=97)
    nprng = np.random.default_rng(0)
    params = parseq.init(jax.random.key(0), base)
    key = jax.random.key(1, impl='unsafe_rbg')
    BS = 384

    def batch(seed):
        k = jax.random.key(seed)
        im = jax.random.uniform(k, (BS, *base.img_size, 3), jnp.float32)
        tgt = jnp.asarray(nprng.integers(0, 90, (BS, base.max_label_length + 2)), jnp.int32)
        perms = jnp.asarray(parseq.gen_tgt_perms(nprng, base))
        return im, tgt, perms

    # --- numerical identity check (dropout off, f32, m=4) ---
    cfg0 = dataclasses.replace(base, remat=True, dropout=0.0)
    b0 = batch(7)
    g_prod = jax.jit(lambda p, im, t, pe: prod_scanned_grads(
        p, cfg0, im, t, pe, dtype=jnp.float32, rng=None, m=4))(params, *b0)
    g_split = jax.jit(jax.grad(lambda p, im, t, pe: split_loss(
        p, cfg0, im, t, pe, dtype=jnp.float32, rng=None, m=4)))(params, *b0)
    # Relative to max(leaf scale, 1e-3): near-zero-scale leaves (masked
    # rows etc.) otherwise blow up the ratio on f32 reduction-order noise.
    errs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))
                           / jnp.maximum(jnp.max(jnp.abs(a)), 1e-3)),
        g_prod, g_split)
    worst = max(jax.tree.leaves(errs))
    print(f'grad identity (dropout off, f32): worst rel err {worst:.2e}', flush=True)

    # --- timing ---
    def timeit(fn, label):
        try:
            w = batch(999)
            jax.block_until_ready(fn(params, *w))
            batches = [batch(100 + i) for i in range(args.steps)]
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                o = None
                for b in batches:
                    o = fn(params, *b)
                jax.block_until_ready(o)
                times.append((time.perf_counter() - t0) / len(batches))
            t = statistics.median(times)
            print(f'{label}: {t*1e3:6.1f} ms ({BS/t:.0f} img/s)', flush=True)
        except Exception as e:  # noqa: BLE001 - compile failure is a result
            print(f'{label}: FAILED {type(e).__name__}: {str(e)[:150]}', flush=True)

    cfg_r = dataclasses.replace(base, remat=True)
    cfg_nr = dataclasses.replace(base, remat=False)

    timeit(jax.jit(lambda p, im, t, pe: prod_scanned_grads(
        p, cfg_r, im, t, pe, dtype=jnp.bfloat16, rng=key, m=4)),
        'production scanned m=4 (remat on)   ')
    for m in (2, 4, 8):
        timeit(jax.jit(jax.grad(lambda p, im, t, pe, m=m: split_loss(
            p, cfg_r, im, t, pe, dtype=jnp.bfloat16, rng=key, m=m,
            outer_ckpt=False))),
            f'split m={m}, NO outer ckpt, remat ON')
    if args.outer:
        for m in (2, 4, 8):
            timeit(jax.jit(jax.grad(lambda p, im, t, pe, m=m: split_loss(
                p, cfg_r, im, t, pe, dtype=jnp.bfloat16, rng=key, m=m))),
                f'split m={m}, outer ckpt, remat ON   ')
            timeit(jax.jit(jax.grad(lambda p, im, t, pe, m=m: split_loss(
                p, cfg_nr, im, t, pe, dtype=jnp.bfloat16, rng=key, m=m))),
                f'split m={m}, outer ckpt, remat OFF  ')


if __name__ == '__main__':
    main()
