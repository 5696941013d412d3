#!/usr/bin/env python
"""Decoder fwd+bwd batch scaling — why the boundary split loses.

The first decoder_train_decomposition.py run (per-call relay timing, now
known broken) claimed the decoder+head+loss forward was 1.8x better per
image at full batch; the boundary-split step moved decoder fwd+bwd to
full batch on that basis but measured SLOWER overall (114.5 vs 103.5 ms,
boundary_split.py). This times the decoder piece's value_and_grad (wrt
params AND memory, the exact cotangent path the split needs) at bs=96 vs
bs=384 — the measurement that exposed the artifact.

Measurement note: per-call host timing is unusable at this op size — the
relay acks sub-ms for a piece whose pure-matmul floor is >1 ms — so all
timing goes through experiments/_timing.slope_ms (in-jit scan, fetch-
forced, two-length slope) with unsafe_rbg keys matching the production
train loop's dropout RNG (train/loop.py:259-262).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from _timing import slope_ms
from parseq_tpu.models import parseq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=40, help='scan length inside jit')
    args = ap.parse_args()
    cfg = parseq.PARSeqConfig(num_tokens=97)
    nprng = np.random.default_rng(0)
    params = parseq.init(jax.random.key(0), cfg)
    T = (cfg.img_size[0] // cfg.vit.patch_size[0]) * (
        cfg.img_size[1] // cfg.vit.patch_size[1])
    D = cfg.embed_dim
    N = args.iters

    def piece(p, memory, tgt, perms, rng):
        tgt_in = tgt[:, :-1]
        tgt_out = tgt[:, 1:]
        padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)
        K = perms.shape[0]

        def decode_one(c, q, r):
            out = parseq.decode(p, cfg, tgt_in, memory, query_bias=q,
                                content_bias=c, padding_mask=padding_mask,
                                dtype=jnp.bfloat16, drop=cfg.dropout, rng=r)
            return parseq.head(p, out)

        logits = jax.vmap(decode_one)(cb, qb, jax.random.split(rng, K))
        base_valid = tgt_out != cfg.pad_id
        eos_pos = tgt_out == cfg.eos_id
        k_idx = jnp.arange(K)[:, None, None]
        valid = base_valid[None] & ((k_idx < 2) | ~eos_pos[None])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
        nll = -jnp.take_along_axis(
            logp, tgt_safe[None, ..., None].repeat(K, 0), axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    def run_scan(bs, grad):
        """Slope-timed ms/evaluation, normalized to effective bs=384."""
        reps = 384 // bs
        tgt = jnp.asarray(nprng.integers(0, 90, (bs, cfg.max_label_length + 2)),
                          jnp.int32)
        perms = jnp.asarray(parseq.gen_tgt_perms(nprng, cfg))
        mem0 = jax.random.normal(jax.random.key(5), (bs, T, D), jnp.bfloat16)

        inner = (jax.value_and_grad(piece, argnums=(0, 1)) if grad else piece)

        def body(i, k):
            # perturb memory per iteration so no two iterations share inputs
            mem = mem0 * (1.0 + 0.001 * i.astype(jnp.bfloat16))
            if grad:
                (loss, (gp, gm)) = inner(params, mem, tgt, perms, k)
                return loss + gm.astype(jnp.float32).sum()
            return inner(params, mem, tgt, perms, k)

        return slope_ms(body, n1=N // 4, n2=N, key_impl='unsafe_rbg') * reps

    for bs in (96, 192, 384):
        fwd = run_scan(bs, grad=False)
        both = run_scan(bs, grad=True)
        print(f'bs={bs}: fwd {fwd:6.2f} ms  fwd+bwd {both:6.2f} ms '
              f'(per effective-384, slope-timed, rbg keys)', flush=True)


if __name__ == '__main__':
    main()
