"""Checkpoint resume: training state round-trips through train_state.ckpt."""

import json

import numpy as np

import jax.numpy as jnp

from .test_train_loop import data_root  # noqa: F401  (fixture)


def _config(data_root, **kw):  # noqa: F811
    return {
        'model': {
            'name': 'parseq', 'img_size': [16, 32], 'patch_size': [4, 8],
            'max_label_length': 7,
            'charset_train': 'abcdefghijklmnopqrstuvwxyz',
            'charset_test': 'abcdefghijklmnopqrstuvwxyz',
            'batch_size': 4, 'lr': 3e-4, 'weight_decay': 0.0, 'warmup_pct': 0.2,
            'embed_dim': 32, 'enc_num_heads': 2, 'enc_mlp_ratio': 2, 'enc_depth': 1,
            'dec_num_heads': 4, 'dec_mlp_ratio': 2, 'dec_depth': 1,
            'perm_num': 6, 'perm_forward': True, 'perm_mirrored': True,
            'dropout': 0.0, 'decode_ar': False, 'refine_iters': 0,
        },
        'data': {'root_dir': str(data_root), 'train_dir': 'real', 'num_workers': 0,
                 'augment': False, 'batch_size': 4},
        'trainer': {'max_epochs': 2, 'val_check_interval': 2,
                    'gradient_clip_val': 20, 'devices': 1, 'swa': False},
        **kw,
    }


def test_resume_continues_from_step(data_root, tmp_path):  # noqa: F811
    from parseq_tpu.train.loop import train

    cfg = _config(data_root)
    state1, _ = train(cfg, tmp_path / 'run1', compute_dtype=jnp.float32, max_steps=2)
    resume_path = tmp_path / 'run1' / 'checkpoints' / 'train_state.ckpt'
    assert resume_path.exists()

    cfg2 = _config(data_root, ckpt_path=str(resume_path))
    state2, _ = train(cfg2, tmp_path / 'run2', compute_dtype=jnp.float32, max_steps=4)
    assert int(state2['step']) == 4
    metrics = [json.loads(l) for l in open(tmp_path / 'run2' / 'metrics.jsonl')]
    steps = [m['step'] for m in metrics if 'loss' in m]
    assert min(steps) > 2  # resumed past the first run's steps
