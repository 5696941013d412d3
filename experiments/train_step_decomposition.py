#!/usr/bin/env python
"""PARSeq-S training-step stage timings on the real chip (bs=384, K=6 perms).

Splits the 150 ms production step into: loss forward only, fwd+bwd
(value_and_grad), full step (+ optimizer/gnorm), and remat on/off — remat
was adopted in round 1 because the bs=384 backward failed to compile, and
the encoder has since shrunk (GELU fix); re-check whether paying the
encoder recompute is still required.
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
from parseq_tpu.train import optim
from parseq_tpu.train.steps import make_parseq_train_step


def timed_steps(fn, batches, warm, trials=3):
    out = fn(*warm)
    jax.block_until_ready(out)
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        o = None
        for b in batches:
            o = fn(*b)
        jax.block_until_ready(o)
        times.append((time.perf_counter() - t0) / len(batches))
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, default=384)
    ap.add_argument('--steps', type=int, default=12)
    args = ap.parse_args()
    bs = args.bs

    base = parseq.PARSeqConfig(num_tokens=97)
    rng = np.random.default_rng(0)
    params = parseq.init(jax.random.key(0), base)

    def batch(seed):
        k = jax.random.key(seed)
        im = jax.random.uniform(k, (bs, *base.img_size, 3), jnp.float32)
        tgt = jnp.asarray(rng.integers(0, 90, (bs, base.max_label_length + 2)), jnp.int32)
        perms = jnp.asarray(parseq.gen_tgt_perms(rng, base))
        return im, tgt, perms

    batches = [batch(i) for i in range(args.steps)]
    warm = batch(999)
    key = jax.random.key(1)

    for remat in (True, False):
        cfg = dataclasses.replace(base, remat=remat)

        def loss_of(p, im, tgt, perms):
            loss, _ = parseq.multi_perm_loss(p, cfg, im, tgt, perms,
                                             dtype=jnp.bfloat16, rng=key)
            return loss

        try:
            fwd = jax.jit(loss_of)
            t_f = timed_steps(lambda im, tgt, pm: fwd(params, im, tgt, pm),
                              batches, warm)
            g = jax.jit(jax.grad(loss_of))
            t_g = timed_steps(lambda im, tgt, pm: g(params, im, tgt, pm),
                              batches, warm)
            print(f'remat={remat!s:5}  loss fwd: {t_f*1e3:6.1f} ms   '
                  f'fwd+bwd: {t_g*1e3:6.1f} ms')
        except Exception as e:  # noqa: BLE001 - OOM/compile failure is a result here
            print(f'remat={remat!s:5}  FAILED: {type(e).__name__}: {str(e)[:120]}')

    # full production step (remat=True path inside families)
    ocfg = optim.OptimConfig(lr=7e-4, batch_size=bs, total_steps=1000)
    tx, _ = optim.make_optimizer(ocfg, params)
    state = {'params': params, 'stats': {}, 'opt_state': tx.init(params),
             'step': jnp.zeros((), jnp.int32)}
    step_fn = jax.jit(make_parseq_train_step(base, tx), donate_argnums=(0,))

    im, tgt, perms = warm
    state, m = step_fn(state, im, tgt, perms, key)
    _ = float(m['loss'])
    times = []
    for trial in range(3):
        t0 = time.perf_counter()
        for im, tgt, perms in batches:
            state, m = step_fn(state, im, tgt, perms, key)
        _ = float(m['loss'])
        times.append((time.perf_counter() - t0) / len(batches))
    t = statistics.median(times)
    print(f'full step (prod): {t*1e3:6.1f} ms = {bs/t:.0f} img/s')


if __name__ == '__main__':
    main()
