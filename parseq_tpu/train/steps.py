"""Generic jit-able train step over any model family.

Mixed precision follows the reference trainer (bf16-mixed, train.py:60-64):
parameters/optimizer state in float32, forward/backward in bfloat16, loss and
gradient reduction in float32. SPMD data parallelism: callers jit with batch
sharded over the ('data',) mesh axis and params replicated; XLA inserts the
gradient psum.

State layout: {'params', 'stats', 'opt_state', 'step'} — `stats` holds
BatchNorm running statistics (empty dict for stateless models), threaded
functionally and excluded from differentiation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_train_step(family, cfg, tx, compute_dtype=jnp.bfloat16, **static):
    """family: train.families.TrainFamily. Returns
    train_step(state, batch: dict, rng) -> (state, metrics)."""

    def loss_fn(params, stats, batch, rng):
        loss, new_stats, numel = family.loss(params, stats, cfg, batch, rng,
                                             compute_dtype, **static)
        return loss, (new_stats, numel)

    def train_step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state['step'])
        (loss, (new_stats, numel)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state['params'], state['stats'], batch, step_rng)
        updates, opt_state = tx.update(grads, state['opt_state'], state['params'])
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), state['params'], updates)
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                             for g in jax.tree.leaves(grads)))
        new_state = {'params': params, 'stats': new_stats,
                     'opt_state': opt_state, 'step': state['step'] + 1}
        return new_state, {'loss': loss, 'numel': numel, 'grad_norm': gnorm}

    return train_step


def init_state(key, init_fn, tx):
    tree = init_fn(key)
    if isinstance(tree, dict) and 'params' in tree and 'stats' in tree:
        params, stats = tree['params'], tree['stats']
    else:
        params, stats = tree, {}
    return {'params': params, 'stats': stats,
            'opt_state': tx.init(params), 'step': jnp.zeros((), jnp.int32)}


# Backwards-compatible PARSeq-only step (used by __graft_entry__).
def make_parseq_train_step(cfg, tx, compute_dtype=jnp.bfloat16):
    from parseq_tpu.train.families import FAMILIES

    fam = FAMILIES['parseq']
    base = make_train_step(fam, cfg, tx, compute_dtype)

    def train_step(state, images, tgt_ids, perms, rng):
        batch = {'images': images, 'tgt': tgt_ids, 'perms': perms}
        if 'stats' not in state:
            state = dict(state, stats={})
        new_state, metrics = base(state, batch, rng)
        return new_state, metrics

    return train_step
