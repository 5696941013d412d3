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


def normalize_u8(x):
    """uint8 -> f32 in [-1, 1], exact host op order ((x/255 - .5)/.5,
    reference module.py:80-81) so values are bit-identical to f32 transport
    (XLA may fuse the affine into an FMA, flipping the last bit). The single
    source of truth for the u8 device-side normalize — train step, SWA/BN
    re-estimation, validate, and eval all route through it."""
    return (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5


def normalize_images(batch):
    """uint8 images -> f32 in [-1, 1] on device (no-op for float input).

    The training loader ships uint8 batches (4x less worker IPC + H2D than
    f32 — measured 56k vs 2.9k img/s pool roundtrip on the 1-core host,
    experiments/train_datapath_decomposition.py) and this normalize runs
    inside the jitted step.
    """
    img = batch['images']
    if img.dtype == jnp.uint8:
        batch = dict(batch, images=normalize_u8(img))
    return batch


def make_train_step(family, cfg, tx, compute_dtype=jnp.bfloat16, microbatches=1,
                    **static):
    """family: train.families.TrainFamily. Returns
    train_step(state, batch: dict, rng) -> (state, metrics).

    ``microbatches`` > 1 splits the batch INSIDE the jitted step (lax.scan
    over equal slices, grads averaged with equal weight, ONE optimizer
    update) — the same gradient semantics as the reference's 2-GPU DDP
    (per-replica mean then equal-weight allreduce, train.py:65-67).
    Measured on v5e-1 (experiments/microbatch_noremat.py, PARSeq-S bs=384,
    remat on): x4 slices cut the step 137.7 -> ~102 ms — the smaller
    backward working set schedules better than one bs=384 backward; the
    no-remat variants lose (saved-activation traffic beats recompute only
    in the wrong direction here).
    """

    def loss_fn(params, stats, batch, rng):
        loss, new_stats, numel = family.loss(params, stats, cfg,
                                             normalize_images(batch), rng,
                                             compute_dtype, **static)
        return loss, (new_stats, numel)

    def _grads_single(state, batch, step_rng):
        (loss, (new_stats, numel)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state['params'], state['stats'], batch, step_rng)
        return loss, new_stats, numel, grads

    def _grads_scanned(state, batch, step_rng, m):
        B = batch['images'].shape[0]
        mb = B // m
        # Split only per-sample arrays (leading dim == B); side inputs like
        # the shared perm set (K, L) broadcast to every microbatch.
        split_keys = [k for k, v in batch.items()
                      if hasattr(v, 'shape') and v.ndim > 0 and v.shape[0] == B]
        xs = {k: batch[k].reshape(m, mb, *batch[k].shape[1:]) for k in split_keys}
        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                             state['params'])

        def body(carry, x):
            stats, g_acc, loss_acc, numel_acc, i = carry
            mbatch = dict(batch, **x)
            r = jax.random.fold_in(step_rng, i)
            (loss, (new_stats, numel)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state['params'], stats, mbatch, r)
            g_acc = jax.tree.map(lambda a, b: a + b.astype(jnp.float32), g_acc, g)
            return (new_stats, g_acc, loss_acc + loss, numel_acc + numel, i + 1), None

        carry0 = (state['stats'], zeros, jnp.zeros((), jnp.float32),
                  jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        (new_stats, g_sum, loss_sum, numel_sum, _), _ = jax.lax.scan(
            body, carry0, xs, length=m)
        grads = jax.tree.map(lambda g: g / m, g_sum)
        return loss_sum / m, new_stats, numel_sum, grads

    def train_step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state['step'])
        B = batch['images'].shape[0]
        m = microbatches if microbatches > 1 and B % microbatches == 0 else 1
        if m == 1:
            loss, new_stats, numel, grads = _grads_single(state, batch, step_rng)
        else:
            loss, new_stats, numel, grads = _grads_scanned(state, batch, step_rng, m)
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
def make_parseq_train_step(cfg, tx, compute_dtype=jnp.bfloat16, microbatches=1):
    from parseq_tpu.train.families import FAMILIES

    fam = FAMILIES['parseq']
    base = make_train_step(fam, cfg, tx, compute_dtype, microbatches=microbatches)

    def train_step(state, images, tgt_ids, perms, rng):
        batch = {'images': images, 'tgt': tgt_ids, 'perms': perms}
        if 'stats' not in state:
            state = dict(state, stats={})
        new_state, metrics = base(state, batch, rng)
        return new_state, metrics

    return train_step
