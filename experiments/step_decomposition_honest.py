#!/usr/bin/env python
"""Honest (slope-timed) full train-step decomposition at m=4, bs=384.

Slope-timed pieces so far: encoder fwd+bwd 62.0 ms (bs=96 x4,
encoder_bwd_floor.py), decoder+head+CE fwd+bwd 17.1 ms
(decoder_bwd_scaling.py) = 79 ms, yet the step was recorded at 102 ms
via sequential-dispatch wall timing. This measures, with the same
in-jit-chained slope methodology (state threaded through the scan carry
so every iteration depends on the last):

  1. grads only (the steps.py _grads_scanned core, m=4)
  2. full production train_step (grads + AdamW/OneCycle update)
  3. optimizer update alone (apply fixed grads repeatedly)

to locate the remaining cost and decide if it is real work or dispatch
accounting.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.data import Tokenizer
from parseq_tpu.models import parseq
from parseq_tpu.train import families, optim, steps

CHARS = ''.join(chr(c) for c in range(33, 127))  # 94-charset


def slope_chain(step_fn, carry0, n1, n2, trials=5):
    """step_fn(carry, i, key) -> (carry, scalar). Chained scan so no
    iteration is skippable; returns ms/iteration via two-length slope."""

    def make(n):
        @jax.jit
        def run(key):
            def body(c, i):
                carry, acc = c
                carry, s = step_fn(carry, i, jax.random.fold_in(key, i))
                return (carry, acc + s), None
            (carry, acc), _ = jax.lax.scan(body, (carry0, jnp.zeros(())),
                                           jnp.arange(n), length=n)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) * 0
                             for l in jax.tree.leaves(carry))
        return run

    f1, f2 = make(n1), make(n2)
    float(f1(jax.random.key(0, impl='unsafe_rbg')))
    float(f2(jax.random.key(0, impl='unsafe_rbg')))

    def med(f):
        ts = []
        for t in range(trials):
            t0 = time.perf_counter()
            float(f(jax.random.key(100 + t, impl='unsafe_rbg')))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    return (med(f2) - med(f1)) / (n2 - n1) * 1e3


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', nargs='*', default=['grads', 'full', 'opt'],
                    choices=['grads', 'full', 'opt'])
    args = ap.parse_args()
    bs, m, total_steps = 384, 4, 1000
    cfg = parseq.PARSeqConfig(num_tokens=97, remat=True)
    tok = Tokenizer(CHARS)
    nprng = np.random.default_rng(0)
    params = parseq.init(jax.random.key(0), cfg)

    fam = families.FAMILIES['parseq']
    ocfg = optim.OptimConfig(lr=7e-4, batch_size=bs, total_steps=total_steps)
    tx, _ = optim.make_optimizer(ocfg, params)
    state = {'params': params, 'stats': {}, 'opt_state': tx.init(params),
             'step': jnp.zeros((), jnp.int32)}
    train_step = steps.make_train_step(fam, cfg, tx, microbatches=m)

    im0 = jax.random.uniform(jax.random.key(7), (bs, *cfg.img_size, 3), jnp.float32)
    labels = [''.join(nprng.choice(list(CHARS),
                                   size=nprng.integers(1, cfg.max_label_length)))
              for _ in range(bs)]
    tgt = jnp.asarray(tok.encode(labels, cfg.max_label_length))
    perms = jnp.asarray(parseq.gen_tgt_perms(nprng, cfg))
    batch0 = {'images': im0, 'tgt': tgt, 'perms': perms}

    # ---- 1. grads only (steps.py core without the optimizer) ----
    def loss_fn(p, b, r):
        loss, _, _ = fam.loss(p, {}, cfg, b, r, jnp.bfloat16)
        return loss

    def grads_step(carry, i, key):
        p = carry
        im = im0 * (1.0 + 1e-4 * i.astype(jnp.float32))
        mb = bs // m
        xs = {'images': im.reshape(m, mb, *im.shape[1:]),
              'tgt': tgt.reshape(m, mb, -1)}
        zeros = jax.tree.map(lambda q: jnp.zeros(q.shape, jnp.float32), p)

        def body(c, x):
            g_acc, j = c
            b = {'images': x['images'], 'tgt': x['tgt'], 'perms': perms}
            g = jax.grad(loss_fn)(p, b, jax.random.fold_in(key, j))
            return (jax.tree.map(lambda a, bb: a + bb.astype(jnp.float32), g_acc, g),
                    j + 1), None

        (g_sum, _), _ = jax.lax.scan(body, (zeros, jnp.zeros((), jnp.int32)),
                                     xs, length=m)
        # couple the carry to the result so iterations chain
        p2 = jax.tree.map(lambda a, g: a + 0.0 * g.astype(a.dtype), p, g_sum)
        s = sum(jnp.sum(l) for l in jax.tree.leaves(
            jax.tree.map(lambda g: jnp.sum(jnp.abs(g)) * 1e-9, g_sum)))
        return p2, s

    t_grads = float('nan')
    if 'grads' in args.only:
        t_grads = slope_chain(grads_step, params, 3, 9)
        print(f'grads only (m=4)        : {t_grads:7.2f} ms', flush=True)

    # ---- 2. full train step ----
    def full_step(carry, i, key):
        st = carry
        im = im0 * (1.0 + 1e-4 * i.astype(jnp.float32))
        b = {'images': im, 'tgt': tgt, 'perms': perms}
        st, metrics = train_step(st, b, key)
        return st, metrics['loss'] * 1e-6

    t_full = float('nan')
    if 'full' in args.only:
        t_full = slope_chain(full_step, state, 3, 9)
        print(f'full step (grads+AdamW) : {t_full:7.2f} ms', flush=True)

    # ---- 3. optimizer update alone ----
    fixed_grads = jax.tree.map(lambda q: jnp.full(q.shape, 1e-6, jnp.float32), params)

    def opt_step(carry, i, key):
        st = carry
        g = jax.tree.map(lambda a: a * (1.0 + 1e-4 * i.astype(jnp.float32)),
                         fixed_grads)
        updates, new_opt = tx.update(g, st['opt_state'], st['params'])
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  st['params'], updates)
        st = dict(st, params=new_params, opt_state=new_opt,
                  step=st['step'] + 1)
        # scalar must genuinely depend on the update or XLA DCEs it
        return st, jnp.sum(jnp.abs(jax.tree.leaves(updates)[0].astype(jnp.float32))) * 1e-9

    t_opt = float('nan')
    if 'opt' in args.only:
        t_opt = slope_chain(opt_step, state, 5, 25)
        print(f'optimizer update alone  : {t_opt:7.2f} ms', flush=True)
    print(f'=> pieces: enc 62.0 + dec 17.1 + opt {t_opt:.1f} = '
          f'{62.0 + 17.1 + t_opt:.1f} vs grads {t_grads:.1f} / full {t_full:.1f}',
          flush=True)


if __name__ == '__main__':
    main()
