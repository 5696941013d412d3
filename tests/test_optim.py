"""Optimizer/schedule semantics vs the reference recipe."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parseq_tpu.train import optim


def test_lr_scaling_rule():
    # base.py:100-102: lr * accum * sqrt(devices) * batch/256
    cfg = optim.OptimConfig(lr=7e-4, batch_size=384, num_devices=2, accum=1)
    assert optim.scaled_lr(cfg) == pytest.approx(7e-4 * math.sqrt(2) * 384 / 256)


def test_onecycle_matches_torch_shape():
    """Warmup to peak at pct_start, cosine to peak/final_div_factor."""
    cfg = optim.OptimConfig(lr=1e-3, batch_size=256, total_steps=1000,
                            warmup_pct=0.1, swa=False)
    sched = optim.onecycle_schedule(cfg)
    peak = optim.scaled_lr(cfg)
    assert float(sched(0)) == pytest.approx(peak / 25.0, rel=1e-3)  # div_factor
    assert float(sched(100)) == pytest.approx(peak, rel=1e-3)  # peak at pct_start
    # torch OneCycleLR: final = (peak/div_factor)/final_div_factor
    assert float(sched(1000)) == pytest.approx(peak / 25.0 / 1e4, rel=1e-3)
    # monotone up then down
    ls = [float(sched(s)) for s in range(0, 1001, 50)]
    top = int(np.argmax(ls))
    assert all(a <= b + 1e-9 for a, b in zip(ls[:top], ls[1:top + 1]))
    assert all(a >= b - 1e-9 for a, b in zip(ls[top:], ls[top + 1:]))


def test_swa_schedule_clamps_tail():
    cfg = optim.OptimConfig(lr=1e-3, batch_size=256, total_steps=1000,
                            warmup_pct=0.1, swa=True, swa_epoch_start=0.75)
    sched = optim.onecycle_schedule(cfg)
    swa_lr = optim.swa_lr(cfg)
    # train.py:43-50: constant swa_lr from 75% on
    assert float(sched(750)) == pytest.approx(swa_lr, rel=1e-6)
    assert float(sched(999)) == pytest.approx(swa_lr, rel=1e-6)
    assert float(sched(500)) != pytest.approx(swa_lr, rel=1e-3)


def test_swa_average_is_uniform_mean():
    params = {'w': jnp.zeros((3,))}
    st = optim.swa_init(params)
    vals = [1.0, 2.0, 6.0]
    for v in vals:
        st = optim.swa_update(st, {'w': jnp.full((3,), v)})
    np.testing.assert_allclose(np.asarray(st['avg']['w']), np.mean(vals), rtol=1e-6)
    assert int(st['n']) == 3


def test_weight_decay_mask_excludes_no_decay_params():
    from parseq_tpu.models import parseq

    cfg = parseq.PARSeqConfig(num_tokens=13, max_label_length=5, img_size=(16, 32),
                              embed_dim=32, enc_num_heads=2, enc_depth=1,
                              dec_num_heads=4)
    params = parseq.init(jax.random.key(0), cfg)
    mask = optim._no_decay_mask(params)
    assert mask['text_embed']['w'] is False
    assert mask['pos_queries'] is False
    assert mask['encoder']['pos_embed'] is False
    assert mask['head']['w'] is True
    assert mask['head']['b'] is False  # 1-D
    assert mask['decoder']['layers'][0]['linear1']['w'] is True


def test_abinet_optimizer_lm_lr_switch():
    params = {'language': {'w': jnp.zeros((2, 2))}, 'vision': {'w': jnp.zeros((2, 2))}}
    cfg = optim.OptimConfig(lr=1e-3, batch_size=256, total_steps=100,
                            warmup_pct=0.1, swa=False)
    tx, sched = optim.make_abinet_optimizer(cfg, l_lr=1e-4, pretrain_end=50, params=params)
    state = tx.init(params)
    g = {'language': {'w': jnp.ones((2, 2))}, 'vision': {'w': jnp.ones((2, 2))}}
    up, _ = tx.update(g, state, params)
    # during pretraining the LM update magnitude differs from the vision one
    assert not np.allclose(np.asarray(up['language']['w']), np.asarray(up['vision']['w']))


def test_onecycle_finite_at_tiny_total_steps():
    """Regression: optax floors the warmup boundary to int(pct*total); with
    total_steps=2 that made a zero-width interval and NaN LR from step 0."""
    import numpy as np

    from parseq_tpu.train.optim import OptimConfig, onecycle_schedule

    for total in (2, 3, 5, 13):
        sched = onecycle_schedule(OptimConfig(total_steps=total, swa=False))
        vals = np.asarray([float(sched(s)) for s in range(total + 1)])
        assert np.isfinite(vals).all(), (total, vals)
        assert (vals > 0).all()


def test_injected_lr_matches_baked():
    """inject_lr=True must produce bit-near-identical updates to the baked
    schedule, and set_injected_lr must retarget a built optimizer state."""
    import jax
    import jax.numpy as jnp

    from parseq_tpu.train import optim

    params = {'w': jnp.ones((4, 4)), 'b': jnp.zeros((4,))}
    grads = {'w': 0.1 * jnp.ones((4, 4)), 'b': 0.2 * jnp.ones((4,))}
    for lr in (7e-4, 3e-3):
        cfg = optim.OptimConfig(lr=lr, total_steps=100, weight_decay=0.01)
        tx_b, sb = optim.make_optimizer(cfg, params)
        tx_i, si = optim.make_optimizer(cfg, params, inject_lr=True)
        st_b, st_i = tx_b.init(params), tx_i.init(params)
        p_b, p_i = params, params
        for _ in range(5):
            ub, st_b = tx_b.update(grads, st_b, p_b)
            ui, st_i = tx_i.update(grads, st_i, p_i)
            p_b = jax.tree.map(lambda p, u: p + u, p_b, ub)
            p_i = jax.tree.map(lambda p, u: p + u, p_i, ui)
        d = max(float(jnp.abs(a - b).max())
                for a, b in zip(jax.tree.leaves(p_b), jax.tree.leaves(p_i)))
        assert d < 1e-7
        assert abs(float(sb(3)) - float(si(3))) < 1e-9

    # retargeting the LR in state == building the optimizer at that LR
    cfg = optim.OptimConfig(lr=7e-4, total_steps=100)
    tx_i, _ = optim.make_optimizer(cfg, params, inject_lr=True)
    st = optim.set_injected_lr(tx_i.init(params), 3e-3)
    tx_b2, _ = optim.make_optimizer(
        optim.OptimConfig(lr=3e-3, total_steps=100), params)
    ui, _ = tx_i.update(grads, st, params)
    ub, _ = tx_b2.update(grads, tx_b2.init(params), params)
    d = max(float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree.leaves(ui), jax.tree.leaves(ub)))
    assert d < 1e-7
