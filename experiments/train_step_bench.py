#!/usr/bin/env python
"""Training-step and batch-1 latency timings on the real chip.

Training: PARSeq-S, bs=384, K=6 permutations, bf16-mixed, encoder remat —
the production recipe. Batch-1: full AR+refine forward latency.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq
from parseq_tpu.train import optim
from parseq_tpu.train.steps import make_parseq_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, default=384)
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--microbatches', type=int, default=1)
    args = ap.parse_args()
    bs = args.bs

    # train.families forces remat=True inside the loss, so the compiled step
    # here is the production training computation.
    cfg = parseq.PARSeqConfig(num_tokens=97)
    rng = np.random.default_rng(0)
    ocfg = optim.OptimConfig(lr=7e-4, batch_size=bs, total_steps=1000)
    params = parseq.init(jax.random.key(0), cfg)
    tx, _ = optim.make_optimizer(ocfg, params)
    state = {'params': params, 'stats': {}, 'opt_state': tx.init(params),
             'step': jnp.zeros((), jnp.int32)}
    step_fn = jax.jit(make_parseq_train_step(cfg, tx, microbatches=args.microbatches),
                      donate_argnums=(0,))
    base_rng = jax.random.key(1, impl="unsafe_rbg")  # production loop.py rng impl

    def batch(seed):
        k = jax.random.key(seed)
        im = jax.random.uniform(k, (bs, *cfg.img_size, 3), jnp.float32)
        tgt = jnp.asarray(rng.integers(0, 90, (bs, cfg.max_label_length + 2)), jnp.int32)
        perms = jnp.asarray(parseq.gen_tgt_perms(rng, cfg))
        return im, tgt, perms

    im, tgt, perms = batch(999)
    state, m = step_fn(state, im, tgt, perms, base_rng)  # compile
    _ = float(m['loss'])

    times = []
    for trial in range(3):
        batches = [batch(1000 * trial + i) for i in range(args.steps)]
        _ = float(jnp.stack([b[0].sum() for b in batches]).sum())
        t0 = time.perf_counter()
        for im, tgt, perms in batches:
            state, m = step_fn(state, im, tgt, perms, base_rng)
        _ = float(m['loss'])
        times.append((time.perf_counter() - t0) / args.steps)
    t = statistics.median(times)
    print(f'train step bs={bs}: {t * 1e3:.1f} ms = {bs / t:.0f} img/s')

    # batch-1 latency, full AR + refine
    fwd = jax.jit(lambda p, x: parseq.forward(p, cfg, x, dtype=jnp.bfloat16))
    x1 = jax.random.uniform(jax.random.key(7), (1, *cfg.img_size, 3), jnp.float32)
    _ = float(fwd(state['params'], x1).sum())
    lats = []
    for i in range(40):
        xi = jax.random.uniform(jax.random.key(100 + i), (1, *cfg.img_size, 3), jnp.float32)
        xi.block_until_ready()
        t0 = time.perf_counter()
        _ = float(fwd(state['params'], xi).sum())
        lats.append(time.perf_counter() - t0)
    print(f'batch-1 latency: median {1e3 * statistics.median(lats):.2f} ms '
          f'(IQR {1e3 * (np.percentile(lats, 75) - np.percentile(lats, 25)):.2f})')


if __name__ == '__main__':
    main()
