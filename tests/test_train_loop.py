"""End-to-end training smoke test on synthetic LMDB data (8-dev CPU mesh)."""

import io
import json

import numpy as np
import pytest
from PIL import Image, ImageDraw

from .test_lmdb import make_str_db


def _text_image(text, w=64, h=24):
    img = Image.new('RGB', (w, h), (255, 255, 255))
    d = ImageDraw.Draw(img)
    d.text((2, 2), text, fill=(0, 0, 0))
    buf = io.BytesIO()
    img.save(buf, 'PNG')
    return buf.getvalue()


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('data')
    rng = np.random.default_rng(0)
    words = ['cat', 'dog', 'bird', 'fish', 'ab', 'xyz', 'hello', 'world']
    train = [(_text_image(w), w) for w in rng.choice(words, 64)]
    make_str_db(root / 'train' / 'real' / 'syn', train)
    make_str_db(root / 'val' / 'syn', [(_text_image(w), w) for w in words])
    return root


def test_train_smoke(data_root, tmp_path):
    from parseq_tpu.train.loop import train

    config = {
        'model': {
            'name': 'parseq', 'img_size': [16, 32], 'patch_size': [4, 8],
            'max_label_length': 7,
            'charset_train': 'abcdefghijklmnopqrstuvwxyz',
            'charset_test': 'abcdefghijklmnopqrstuvwxyz',
            'batch_size': 4, 'lr': 3e-4, 'weight_decay': 0.0, 'warmup_pct': 0.2,
            'embed_dim': 32, 'enc_num_heads': 2, 'enc_mlp_ratio': 2, 'enc_depth': 1,
            'dec_num_heads': 4, 'dec_mlp_ratio': 2, 'dec_depth': 1,
            'perm_num': 6, 'perm_forward': True, 'perm_mirrored': True,
            'dropout': 0.1, 'decode_ar': False, 'refine_iters': 0,
        },
        'data': {'root_dir': str(data_root), 'train_dir': 'real', 'num_workers': 0,
                 'augment': False, 'batch_size': 4},
        'trainer': {'max_epochs': 2, 'val_check_interval': 3,
                    'gradient_clip_val': 20, 'devices': 2, 'swa': True},
    }
    import jax.numpy as jnp

    state, best = train(config, tmp_path / 'run', compute_dtype=jnp.float32, max_steps=6)
    assert best is not None and best.exists()

    metrics = [json.loads(l) for l in open(tmp_path / 'run' / 'metrics.jsonl')]
    losses = [m['loss'] for m in metrics if 'loss' in m]
    vals = [m for m in metrics if 'val_accuracy' in m]
    assert len(losses) >= 1
    assert all(np.isfinite(l) for l in losses)
    assert len(vals) >= 2

    # checkpoint reload produces a working model
    from parseq_tpu.utils.registry import load_from_checkpoint

    model = load_from_checkpoint(str(best), dtype=jnp.float32)
    imgs = np.zeros((2, 16, 32, 3), np.float32)
    labels, conf = model.read(imgs)
    assert len(labels) == 2


def test_gradient_accumulation(tmp_path):
    """trainer.accumulate_grad_batches=2: one optimizer step per 2 loader
    micro-batches (optax.MultiSteps), max_steps in optimizer-step units,
    params frozen within an accumulation window and updated at its end."""
    import io

    import numpy as np
    from PIL import Image, ImageDraw

    import jax
    from parseq_tpu.train import loop as train_loop
    from parseq_tpu.utils.config import compose, parse_cli_overrides
    from .test_lmdb import make_str_db

    def img_bytes(text):
        im = Image.new('RGB', (48, 16), (255, 255, 255))
        ImageDraw.Draw(im).text((1, 1), text, fill=(0, 0, 0))
        b = io.BytesIO()
        im.save(b, 'PNG')
        return b.getvalue()

    root = tmp_path / 'data'
    words = ['ab', 'cd', 'ef', 'gh']
    make_str_db(root / 'train' / 'real' / 's', [(img_bytes(w), w) for w in words * 8])
    make_str_db(root / 'val' / 's', [(img_bytes(w), w) for w in words])

    cfg = compose(None, overrides=parse_cli_overrides([
        'model.img_size=[16,32]', 'model.enc_depth=1', 'model.embed_dim=32',
        'model.enc_num_heads=2', 'model.dec_num_heads=4',
        'model.max_label_length=5', 'model.batch_size=4',
        'model.decode_ar=false', 'model.refine_iters=0',
        f'data.root_dir={root}', 'data.num_workers=0', 'data.augment=false',
        'trainer.devices=1', 'trainer.swa=false',
        'trainer.accumulate_grad_batches=2', 'trainer.val_check_interval=1']))

    state, _ = train_loop.train(cfg, tmp_path / 'run', max_steps=2)
    # 2 optimizer steps * agb 2 = 4 micro-batches consumed
    assert int(jax.device_get(state['step'])) == 4
    # validation fired at optimizer-step boundaries: micro steps 2 and 4
    import json
    vals = [json.loads(l) for l in open(tmp_path / 'run' / 'metrics.jsonl')
            if 'val_NED' in l]
    assert [v['step'] for v in vals] == [2, 4]
    # MultiSteps state present: inner optimizer stepped twice
    opt_state = jax.device_get(state['opt_state'])
    from optax import MultiStepsState
    assert isinstance(opt_state, MultiStepsState)
    assert int(opt_state.gradient_step) == 2
    assert int(opt_state.mini_step) == 0  # window closed


def test_sharding_invariance_across_mesh_sizes(data_root, tmp_path):
    """The SPMD step is mesh-size invariant: identical data + seed trained on
    1, 2, and 4 virtual devices yield the same loss sequence (the gradient
    psum over the 'data' axis must reproduce single-device math). This is
    the single-host stand-in for multi-chip DP correctness (SURVEY §2.5)."""
    from parseq_tpu.train.loop import train

    def cfg(n_dev):
        return {
            'model': {
                'name': 'parseq', 'img_size': [16, 32], 'patch_size': [4, 8],
                'max_label_length': 7,
                'charset_train': 'abcdefghijklmnopqrstuvwxyz',
                'charset_test': 'abcdefghijklmnopqrstuvwxyz',
                'batch_size': 8, 'lr': 3e-4, 'weight_decay': 0.01, 'warmup_pct': 0.2,
                'embed_dim': 32, 'enc_num_heads': 2, 'enc_mlp_ratio': 2, 'enc_depth': 1,
                'dec_num_heads': 4, 'dec_mlp_ratio': 2, 'dec_depth': 1,
                'perm_num': 6, 'perm_forward': True, 'perm_mirrored': True,
                'dropout': 0.0, 'decode_ar': False, 'refine_iters': 0,
            },
            'data': {'root_dir': str(data_root), 'train_dir': 'real', 'num_workers': 0,
                     'augment': False, 'batch_size': 8},
            'trainer': {'max_epochs': 1, 'val_check_interval': 100,
                        'gradient_clip_val': 20, 'devices': n_dev, 'swa': False},
        }

    import jax.numpy as jnp

    losses = {}
    for n_dev in (1, 2, 4):
        train(cfg(n_dev), tmp_path / f'run{n_dev}', compute_dtype=jnp.float32,
              max_steps=4)
        metrics = [json.loads(l) for l in open(tmp_path / f'run{n_dev}' / 'metrics.jsonl')]
        losses[n_dev] = [m['loss'] for m in metrics if 'loss' in m]
    assert losses[1] and len(losses[1]) == len(losses[2]) == len(losses[4])
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-5)
    np.testing.assert_allclose(losses[1], losses[4], rtol=2e-5)


def test_microbatched_step_matches_single(tmp_path):
    """In-jit microbatch accumulation (steps.make_train_step microbatches=4)
    must match the single-batch step exactly when dropout is off (equal
    per-slice weighting = reference DDP grad averaging)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from parseq_tpu.models import parseq
    from parseq_tpu.train import optim
    from parseq_tpu.train.steps import make_parseq_train_step

    cfg = parseq.PARSeqConfig(num_tokens=13, max_label_length=5, img_size=(16, 32),
                              patch_size=(4, 8), embed_dim=32, enc_num_heads=2,
                              enc_depth=2, dec_num_heads=4, dec_depth=1, dropout=0.0)
    rng_np = np.random.default_rng(0)
    B = 8
    images = jnp.asarray(rng_np.uniform(size=(B, *cfg.img_size, 3)), jnp.float32)
    # chars only (no EOS=0 / PAD): every position valid in every slice, so the
    # DDP-style mean-of-slice-means equals the global mean exactly (with
    # unequal slice numels they differ by design, as across DDP replicas).
    tgt = jnp.asarray(rng_np.integers(1, 10, (B, cfg.max_label_length + 2)), jnp.int32)
    perms = jnp.asarray(parseq.gen_tgt_perms(rng_np, cfg))
    key = jax.random.key(1)

    results = {}
    for m in (1, 4):
        ocfg = optim.OptimConfig(lr=1e-3, batch_size=B, total_steps=10)
        params = parseq.init(jax.random.key(0), cfg)
        tx, _ = optim.make_optimizer(ocfg, params)
        state = {'params': params, 'stats': {}, 'opt_state': tx.init(params),
                 'step': jnp.zeros((), jnp.int32)}
        step = jax.jit(make_parseq_train_step(cfg, tx, compute_dtype=jnp.float32,
                                              microbatches=m))
        state, metrics = step(state, images, tgt, perms, key)
        results[m] = (jax.device_get(state['params']), float(metrics['loss']),
                      float(metrics['grad_norm']), int(metrics['numel']))

    p1, l1, g1, n1 = results[1]
    p4, l4, g4, n4 = results[4]
    assert n1 == n4
    np.testing.assert_allclose(l4, l1, rtol=1e-5)
    np.testing.assert_allclose(g4, g1, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
