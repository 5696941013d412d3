"""Train-loop smoke tests for every model family (few steps, CPU mesh)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from .test_train_loop import data_root  # noqa: F401  (fixture)

BASE_DATA = dict(train_dir='real', num_workers=0, augment=False, batch_size=4)
# devices=1 here: SPMD multi-device training is covered by
# test_train_loop.py (devices=2); these validate per-family loss plumbing.
BASE_TRAINER = dict(max_epochs=1, val_check_interval=2, gradient_clip_val=20,
                    devices=1, swa=False)
CHARSET = 'abcdefghijklmnopqrstuvwxyz'


def _run(data_root, tmp_path, model_cfg, steps=2):  # noqa: F811
    from parseq_tpu.train.loop import train

    config = {
        'model': dict(charset_train=CHARSET, charset_test=CHARSET,
                      max_label_length=7, batch_size=4, weight_decay=0.0,
                      warmup_pct=0.2, **model_cfg),
        'data': dict(root_dir=str(data_root), **BASE_DATA),
        'trainer': dict(BASE_TRAINER),
    }
    state, best = train(config, tmp_path / 'run', compute_dtype=jnp.float32,
                        max_steps=steps)
    metrics = [json.loads(l) for l in open(tmp_path / 'run' / 'metrics.jsonl')]
    losses = [m['loss'] for m in metrics if 'loss' in m]
    assert losses and all(np.isfinite(l) for l in losses)
    vals = [m for m in metrics if 'val_accuracy' in m]
    assert vals
    assert best is not None and best.exists()

    from parseq_tpu.utils.registry import load_from_checkpoint

    model = load_from_checkpoint(str(best), dtype=jnp.float32)
    h, w = model.img_size
    labels, _ = model.read(np.zeros((2, h, w, 3), np.float32))
    assert len(labels) == 2


def test_train_vitstr(data_root, tmp_path):  # noqa: F811
    _run(data_root, tmp_path, dict(
        name='vitstr', lr=3e-4, img_size=[16, 32], patch_size=[8, 8],
        depth=1, embed_dim=32, num_heads=4))


def test_train_crnn(data_root, tmp_path):  # noqa: F811
    _run(data_root, tmp_path, dict(
        name='crnn', lr=3e-4, img_size=[32, 64], hidden_size=16, leaky_relu=False))


def test_train_trba(data_root, tmp_path):  # noqa: F811
    _run(data_root, tmp_path, dict(
        name='trba', lr=3e-4, img_size=[32, 64], num_fiducial=6,
        output_channel=32, hidden_size=16))


def test_train_trbc(data_root, tmp_path):  # noqa: F811
    _run(data_root, tmp_path, dict(
        name='trbc', lr=3e-4, img_size=[32, 64], num_fiducial=6,
        output_channel=32, hidden_size=16))


def test_train_abinet_staged(data_root, tmp_path):  # noqa: F811
    # 4 steps: pretrain phase covers ~first 44%, so the run crosses the
    # phase switch and exercises the alignment reset.
    _run(data_root, tmp_path, dict(
        name='abinet', lr=3e-4, l_lr=3e-4, img_size=[32, 64], d_model=512,
        nhead=4, d_inner=64, v_num_layers=1, l_num_layers=1, iter_size=1,
        activation='relu', v_backbone='transformer', v_attention='position',
        v_attention_mode='nearest', l_use_self_attn=False, l_detach=True,
        a_loss_weight=1.0, v_loss_weight=1.0, l_loss_weight=1.0, dropout=0.1),
        steps=4)
