"""Optimizer + LR schedule, reproducing the reference recipe.

Reference (/root/reference/strhub/models/base.py:98-107):
  AdamW with effective LR = lr * accum * sqrt(num_devices) * batch_size / 256,
  OneCycleLR (cosine, pct_start=warmup_pct, cycle_momentum=False) stepped
  per optimizer step, gradient clipping 20 (configs/main.yaml trainer block),
  and weight decay excluded for flagged params (timm create_optimizer_v2
  skips 1-D params and model.no_weight_decay(): text_embed, pos_queries,
  pos_embed — parseq/model.py:77-81).

SWA (train.py:43-50,93-95): from 75% of training, LR switches to a constant
swa_lr derived from the OneCycle cosine tail, and weights are averaged
uniformly every epoch. We implement this as a schedule clamp + a running
parameter average maintained by the train loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class OptimConfig:
    lr: float = 7e-4
    weight_decay: float = 0.0
    warmup_pct: float = 0.075
    batch_size: int = 384
    grad_clip: float = 20.0
    total_steps: int = 169_680
    num_devices: int = 1
    accum: int = 1
    # OneCycleLR torch defaults
    div_factor: float = 25.0
    final_div_factor: float = 1e4
    swa: bool = True
    swa_epoch_start: float = 0.75


def scaled_lr(cfg: OptimConfig) -> float:
    """base.py:100-102 linear/sqrt scaling rule."""
    return cfg.lr * cfg.accum * math.sqrt(cfg.num_devices) * cfg.batch_size / 256.0


def _annealing_cos(start, end, pct):
    """Cosine interpolation from start to end (train.py:37-40)."""
    cos_out = math.cos(math.pi * pct) + 1
    return end + (start - end) / 2.0 * cos_out


def swa_lr(cfg: OptimConfig) -> float:
    """LR value of the OneCycle cosine tail at the SWA start point
    (train.py:43-50: anneal from peak over the post-warmup span)."""
    lr = scaled_lr(cfg)
    return _annealing_cos(lr, lr / cfg.final_div_factor,
                          (cfg.swa_epoch_start - cfg.warmup_pct) / (1 - cfg.warmup_pct))


def onecycle_schedule(cfg: OptimConfig):
    peak = scaled_lr(cfg)
    total = max(int(cfg.total_steps), 2)
    # optax floors the warmup boundary to int(pct_start * total); for tiny
    # runs that collapses the warmup interval to zero width and the piecewise
    # interpolation divides by zero (NaN LR from step 0). Keep both phases at
    # least one step wide — a no-op at production step counts.
    pct = min(max(cfg.warmup_pct, 1.0 / total), (total - 1.0) / total)
    base = optax.cosine_onecycle_schedule(
        transition_steps=total,
        peak_value=peak,
        pct_start=pct,
        div_factor=cfg.div_factor,
        final_div_factor=cfg.final_div_factor,
    )
    if not cfg.swa:
        return base
    swa_start = int(cfg.swa_epoch_start * cfg.total_steps)
    const = swa_lr(cfg)

    def sched(step):
        return jnp.where(step < swa_start, base(step), const)

    return sched


def _no_decay_mask(params):
    """True where weight decay applies: >=2-D weights, excluding embeddings
    and positional tables (timm create_optimizer_v2 + no_weight_decay())."""

    def mask_fn(path, x):
        keys = [getattr(p, 'key', getattr(p, 'name', '')) for p in path]
        name = '/'.join(str(k) for k in keys)
        if x.ndim < 2:
            return False
        for token in ('pos_embed', 'pos_queries', 'text_embed'):
            if token in name:
                return False
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_abinet_optimizer(cfg: OptimConfig, l_lr: float, pretrain_end: int, params):
    """ABINet optimizer: the language model trains with its own LR during
    pretraining; base LRs are unified when joint training starts
    (abinet/system.py:122-140, 161-167)."""
    main_sched = onecycle_schedule(cfg)
    l_cfg = OptimConfig(**{**cfg.__dict__, 'lr': l_lr})
    l_base = onecycle_schedule(l_cfg)

    def l_sched(step):
        return jnp.where(step < pretrain_end, l_base(step), main_sched(step))

    def label_fn(params):
        return {k: ('lm' if k == 'language' else 'rest') for k in params}

    def adamw(sched):
        return optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=cfg.weight_decay,
                           mask=None if not cfg.weight_decay else _no_decay_mask)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform({'lm': adamw(l_sched), 'rest': adamw(main_sched)}, label_fn),
    )
    return tx, main_sched


def lr_schedule(cfg: OptimConfig):
    """The effective LR curve of make_optimizer (either mode) — for callers
    that only need the schedule for logging (e.g. a compile-cache hit in
    train.loop), without building the throwaway optax chain."""
    return onecycle_schedule(cfg)


def make_optimizer(cfg: OptimConfig, params, *, inject_lr=False):
    """AdamW + OneCycle. With inject_lr=True the base LR lives in the
    optimizer STATE (optax.inject_hyperparams) instead of being baked into
    the compiled schedule: the optimizer runs a unit-LR schedule (the whole
    OneCycle curve, SWA tail included, scales linearly with cfg.lr) and a
    final runtime `scale(step_size=cfg.lr)`. A jitted train step built this
    way is reusable across learning rates — the tune CLI changes LR by
    writing opt_state hyperparams (set_injected_lr) with zero recompiles.
    AdamW semantics are preserved: torch couples weight decay with lr
    (p -= lr*wd*p), so scaling the whole update by lr matches."""
    if not inject_lr:
        sched = onecycle_schedule(cfg)
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(
                learning_rate=sched,
                b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=cfg.weight_decay,
                mask=_no_decay_mask(params) if cfg.weight_decay else None,
            ),
        )
        return tx, sched
    import dataclasses

    unit_cfg = dataclasses.replace(cfg, lr=1.0)
    unit_sched = onecycle_schedule(unit_cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=unit_sched,
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.weight_decay,
            mask=_no_decay_mask(params) if cfg.weight_decay else None,
        ),
        optax.inject_hyperparams(optax.scale)(step_size=float(cfg.lr)),
    )

    def sched(step):
        return cfg.lr * unit_sched(step)

    return tx, sched


def set_injected_lr(opt_state, lr: float):
    """Overwrite the runtime LR of an inject_lr=True optimizer state."""
    import optax.tree_utils as otu

    return otu.tree_set(opt_state, step_size=jnp.asarray(lr, jnp.float32))


# ---------------------------------------------------------------------------
# SWA running average
# ---------------------------------------------------------------------------


def swa_init(params):
    return {'avg': jax.tree.map(jnp.zeros_like, params), 'n': jnp.zeros((), jnp.int32)}


def swa_update(swa_state, params):
    """Uniform running average: avg_{n+1} = avg_n + (p - avg_n)/(n+1)."""
    n = swa_state['n']
    new_avg = jax.tree.map(
        lambda a, p: a + (p - a) / (n + 1).astype(p.dtype), swa_state['avg'], params
    )
    return {'avg': new_avg, 'n': n + 1}
