#!/usr/bin/env python
"""Can grad accumulation beat remat? (round 3, PERF lever #1 follow-up)

The bs=384 production step pays ~99 ms of encoder fwd+bwd, ~25 ms over the
structural remat floor; remat=False fails to compile at bs=384. But the
*recompute itself* costs one encoder forward (~20 ms at bs=384). If the
no-remat backward compiles at bs=192 or 128, accumulating 2-3 microbatches
trades the recompute for saved-activation HBM traffic.

Measures jax.grad of the production loss per EFFECTIVE bs=384 batch:
  remat=True  bs=384 x1   (production)
  remat=False bs=384 x1   (expected: compile failure — recorded)
  remat=False bs=192 x2
  remat=False bs=128 x3
  remat=True  bs=192 x2   (control: does splitting alone cost?)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=10)
    args = ap.parse_args()
    base = parseq.PARSeqConfig(num_tokens=97)
    rng = np.random.default_rng(0)
    params = parseq.init(jax.random.key(0), base)
    key = jax.random.key(1, impl='unsafe_rbg')

    def batch(seed, bs):
        k = jax.random.key(seed)
        im = jax.random.uniform(k, (bs, *base.img_size, 3), jnp.float32)
        tgt = jnp.asarray(rng.integers(0, 90, (bs, base.max_label_length + 2)), jnp.int32)
        perms = jnp.asarray(parseq.gen_tgt_perms(rng, base))
        return im, tgt, perms

    for remat, bs, k_acc in [(True, 192, 2), (True, 128, 3), (True, 96, 4),
                             (True, 64, 6), (True, 384, 1)]:
        cfg = dataclasses.replace(base, remat=remat)

        def loss_of(p, im, tgt, perms):
            loss, _ = parseq.multi_perm_loss(p, cfg, im, tgt, perms,
                                             dtype=jnp.bfloat16, rng=key)
            return loss

        g = jax.jit(jax.grad(loss_of))
        try:
            warm = batch(999, bs)
            jax.block_until_ready(g(params, *warm))
            batches = [[batch(100 * i + j, bs) for j in range(k_acc)]
                       for i in range(args.steps)]
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                o = None
                for group in batches:
                    for b in group:
                        o = g(params, *b)
                jax.block_until_ready(o)
                times.append((time.perf_counter() - t0) / len(batches))
            t = statistics.median(times)
            eff = bs * k_acc
            print(f'remat={remat!s:5} bs={bs} x{k_acc}: {t*1e3:6.1f} ms per '
                  f'effective-{eff} batch ({eff/t:.0f} img/s)', flush=True)
        except Exception as e:  # noqa: BLE001 - compile failure is a result
            print(f'remat={remat!s:5} bs={bs} x{k_acc}: FAILED '
                  f'{type(e).__name__}: {str(e)[:150]}', flush=True)


if __name__ == '__main__':
    main()
