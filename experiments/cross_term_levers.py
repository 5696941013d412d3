#!/usr/bin/env python
"""Cheap levers against the ~21 ms microbatch cross-term (VERDICT r3 item 5).

step_decomposition_honest.py established: grads-only m=4 = 99.9 ms at
bs=384 while the isolated pieces sum to ~79 ms. The ~21 ms residue lives
BETWEEN the microbatch grad iterations: d_memory cotangent
materialization (37 MB bf16/direction/microbatch), grad-accumulation
tree traffic (~200 f32 leaves, 23.8M params = 95 MB read+write per
microbatch iteration), and scan-iteration scheduling boundaries.

Before accepting "only whole-step fusion can attack it", measure the
cheap variants:
  A. production (f32 tree accumulation, lax.scan over m, unroll=1)
  B. bf16 grad accumulation (halves accumulator traffic; f32 restore
     at the mean — convergence would need a separate A/B if adopted)
  C. scan unroll=2 / unroll=4 (lets XLA schedule across microbatch
     iterations instead of treating each as a barrier)
  D. flat-vector accumulation (ravel grads into ONE f32 buffer: same
     bytes, but one big add instead of ~200 leaf-wise adds — tests
     whether leaf scheduling, not bytes, is the cost)
  E. m sweep {2, 4, 8} at the best variant from A-D.

Note on the "bf16 cotangent transport" idea from the verdict: the
encoder->decoder memory tensor is ALREADY bf16 (compute dtype), so its
cotangent is bf16 by construction — there is no f32 transport to shave.
The measurable lever is the accumulator, not the boundary cotangent.

Run: python experiments/cross_term_levers.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.data import Tokenizer
from parseq_tpu.models import parseq
from parseq_tpu.train import families, optim, steps
from step_decomposition_honest import slope_chain

CHARS = ''.join(chr(c) for c in range(33, 127))


def make_step_variant(fam, cfg, tx, *, m, accum_dtype=jnp.float32,
                      unroll=1, flat_accum=False):
    """steps.make_train_step's scanned path, parameterized for the A/B."""

    def loss_fn(params, stats, batch, rng):
        loss, new_stats, numel = fam.loss(params, stats, cfg,
                                          steps.normalize_images(batch), rng,
                                          jnp.bfloat16)
        return loss, (new_stats, numel)

    def train_step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state['step'])
        B = batch['images'].shape[0]
        mb = B // m
        split_keys = [k for k, v in batch.items()
                      if hasattr(v, 'shape') and v.ndim > 0 and v.shape[0] == B]
        xs = {k: batch[k].reshape(m, mb, *batch[k].shape[1:]) for k in split_keys}

        if flat_accum:
            from jax.flatten_util import ravel_pytree
            flat0, unravel = ravel_pytree(jax.tree.map(
                lambda p: jnp.zeros(p.shape, accum_dtype), state['params']))
            zeros = flat0
        else:
            zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, accum_dtype),
                                 state['params'])

        def body(carry, x):
            stats, g_acc, loss_acc, i = carry
            mbatch = dict(batch, **x)
            r = jax.random.fold_in(step_rng, i)
            (loss, (new_stats, _)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(state['params'], stats, mbatch, r)
            if flat_accum:
                from jax.flatten_util import ravel_pytree
                gf, _ = ravel_pytree(g)
                g_acc = g_acc + gf.astype(accum_dtype)
            else:
                g_acc = jax.tree.map(lambda a, b: a + b.astype(accum_dtype),
                                     g_acc, g)
            return (new_stats, g_acc, loss_acc + loss, i + 1), None

        carry0 = (state['stats'], zeros, jnp.zeros((), jnp.float32),
                  jnp.zeros((), jnp.int32))
        (new_stats, g_sum, loss_sum, _), _ = jax.lax.scan(
            body, carry0, xs, length=m, unroll=unroll)
        if flat_accum:
            g_sum = unravel(g_sum)
        grads = jax.tree.map(lambda g: (g.astype(jnp.float32)) / m, g_sum)
        updates, opt_state = tx.update(grads, state['opt_state'], state['params'])
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                              state['params'], updates)
        new_state = {'params': params, 'stats': new_stats,
                     'opt_state': opt_state, 'step': state['step'] + 1}
        return new_state, {'loss': loss_sum / m}

    return train_step


def main():
    bs = 384
    cfg = parseq.PARSeqConfig(num_tokens=97, remat=True)
    tok = Tokenizer(CHARS)
    nprng = np.random.default_rng(0)
    params = parseq.init(jax.random.key(0), cfg)

    fam = families.FAMILIES['parseq']
    ocfg = optim.OptimConfig(lr=7e-4, batch_size=bs, total_steps=1000)
    tx, _ = optim.make_optimizer(ocfg, params)
    state = {'params': params, 'stats': {}, 'opt_state': tx.init(params),
             'step': jnp.zeros((), jnp.int32)}

    im0 = jax.random.uniform(jax.random.key(7), (bs, *cfg.img_size, 3),
                             jnp.float32)
    labels = [''.join(nprng.choice(list(CHARS),
                                   size=nprng.integers(1, cfg.max_label_length)))
              for _ in range(bs)]
    tgt = jnp.asarray(tok.encode(labels, cfg.max_label_length))
    perms = jnp.asarray(parseq.gen_tgt_perms(nprng, cfg))

    def run(label, **kw):
        ts = make_step_variant(fam, cfg, tx, **kw)

        def full_step(carry, i, key):
            st = carry
            im = im0 * (1.0 + 1e-4 * i.astype(jnp.float32))
            b = {'images': im, 'tgt': tgt, 'perms': perms}
            st, metrics = ts(st, b, key)
            return st, metrics['loss'] * 1e-6
        t = slope_chain(full_step, state, 3, 9)
        print(f'{label:46s} {t:7.2f} ms ({bs/t*1000:,.0f} img/s)', flush=True)
        return t

    # variant tags selectable on argv so relay-interrupted runs can resume
    sel = set(sys.argv[1:])

    def want(tag):
        return not sel or tag in sel

    if want('A'):
        run('A production (f32 acc, unroll=1, m=4)', m=4)
    if want('B'):
        run('B bf16 grad accumulation (m=4)', m=4, accum_dtype=jnp.bfloat16)
    if want('C1'):
        run('C1 scan unroll=2 (m=4)', m=4, unroll=2)
    if want('C2'):
        run('C2 scan unroll=4 / fully unrolled (m=4)', m=4, unroll=4)
    if want('D'):
        run('D flat-vector f32 accumulation (m=4)', m=4, flat_accum=True)
    if want('E2'):
        run('E m=2 (f32 acc, unroll=1)', m=2)
    if want('E8'):
        run('E m=8 (f32 acc, unroll=1)', m=8)


if __name__ == '__main__':
    main()
