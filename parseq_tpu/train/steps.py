"""jit-able train / eval step functions for PARSeq.

Mixed precision follows the reference trainer (bf16-mixed, train.py:60-64):
parameters and optimizer state in float32, forward/backward compute in
bfloat16, loss and gradient reduction in float32. Data parallelism is SPMD:
the caller jits these with batch sharded over the ('data',) mesh axis and
params replicated; XLA inserts the gradient psum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq


def make_train_step(cfg: parseq.PARSeqConfig, tx, compute_dtype=jnp.bfloat16):
    """Returns train_step(state, images, tgt_ids, perms, rng) -> (state, metrics)."""

    def loss_fn(params, images, tgt_ids, perms, rng):
        loss, numel = parseq.multi_perm_loss(
            params, cfg, images, tgt_ids, perms, dtype=compute_dtype, rng=rng
        )
        return loss, numel

    def train_step(state, images, tgt_ids, perms, rng):
        step_rng = jax.random.fold_in(rng, state['step'])
        (loss, numel), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state['params'], images, tgt_ids, perms, step_rng
        )
        updates, opt_state = tx.update(grads, state['opt_state'], state['params'])
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), state['params'], updates)
        gnorm = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
        )
        new_state = {'params': params, 'opt_state': opt_state, 'step': state['step'] + 1}
        return new_state, {'loss': loss, 'numel': numel, 'grad_norm': gnorm}

    return train_step


def make_eval_step(cfg: parseq.PARSeqConfig, compute_dtype=jnp.bfloat16):
    """Returns eval_step(params, images) -> logits (f32), full inference mode."""

    def eval_step(params, images):
        return parseq.forward(params, cfg, images, dtype=compute_dtype)

    return eval_step


def init_state(key, cfg: parseq.PARSeqConfig, tx):
    params = parseq.init(key, cfg)
    return {'params': params, 'opt_state': tx.init(params), 'step': jnp.zeros((), jnp.int32)}
