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


def test_resume_continues_data_stream_epoch(data_root, tmp_path):  # noqa: F811
    """Resume derives the epoch from the step count instead of replaying
    epoch 0's shuffle order (ADVICE.md round-1 finding)."""
    from parseq_tpu.train.loop import train

    # 64 train samples / batch 4 = 16 batches; limit 0.25 -> 4 steps/epoch
    cfg = _config(data_root)
    cfg['trainer']['limit_train_batches'] = 0.25
    cfg['trainer']['max_epochs'] = 10
    train(cfg, tmp_path / 'run1', compute_dtype=jnp.float32, max_steps=6)
    resume_path = tmp_path / 'run1' / 'checkpoints' / 'train_state.ckpt'

    cfg2 = _config(data_root, ckpt_path=str(resume_path))
    cfg2['trainer']['limit_train_batches'] = 0.25
    cfg2['trainer']['max_epochs'] = 10
    train(cfg2, tmp_path / 'run2', compute_dtype=jnp.float32, max_steps=8)
    metrics = [json.loads(l) for l in open(tmp_path / 'run2' / 'metrics.jsonl')]
    first = next(m for m in metrics if 'loss' in m)
    # step 6 was mid-epoch-1 (steps 5-8); the first resumed step must log
    # epoch 1, not a restarted epoch 0
    assert first['step'] == 7
    assert first['epoch'] == 1


def test_swa_reestimates_batchnorm_stats(data_root, tmp_path):  # noqa: F811
    """swa.ckpt carries BatchNorm stats re-estimated for the averaged weights
    (Lightning SWA update_bn semantics, reference train.py:93-95), not the
    last training step's stats."""
    import numpy as np

    from parseq_tpu.train.loop import train
    from parseq_tpu.utils.checkpoint import load_checkpoint
    from parseq_tpu.utils.registry import load_from_checkpoint

    config = {
        'model': dict(name='crnn', lr=3e-3, img_size=[32, 64], hidden_size=16,
                      leaky_relu=False, charset_train='abcdefghijklmnopqrstuvwxyz',
                      charset_test='abcdefghijklmnopqrstuvwxyz',
                      max_label_length=7, batch_size=4, weight_decay=0.0,
                      warmup_pct=0.2),
        'data': {'root_dir': str(data_root), 'train_dir': 'real', 'num_workers': 0,
                 'augment': False, 'batch_size': 4},
        # 16 steps/epoch; swa starts at 0.75*8=6 -> swa_update fires at step 6
        'trainer': {'max_epochs': 1, 'val_check_interval': 4,
                    'gradient_clip_val': 20, 'devices': 1, 'swa': True,
                    'max_steps': 8},
    }
    state, _ = train(config, tmp_path / 'run', compute_dtype=jnp.float32, max_steps=8)
    swa_path = tmp_path / 'run' / 'checkpoints' / 'swa.ckpt'
    assert swa_path.exists()
    swa_tree, _, meta = load_checkpoint(swa_path)
    assert meta.get('swa') is True

    import jax

    last_stats = jax.device_get(state['stats'])
    swa_stats = swa_tree['stats'] if 'stats' in swa_tree else swa_tree
    diffs = jax.tree.map(lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
                         last_stats, swa_stats['stats'] if 'stats' in swa_stats else swa_stats)
    assert max(jax.tree.leaves(diffs)) > 0, 'SWA BN stats identical to last-step stats'

    # and eval runs on the swa checkpoint
    model = load_from_checkpoint(str(swa_path), dtype=jnp.float32)
    labels, _ = model.read(np.zeros((2, 32, 64, 3), np.float32))
    assert len(labels) == 2


def test_resume_preserves_swa_average(data_root, tmp_path):  # noqa: F811
    """swa_state survives resume via the sidecar file: the restored average
    includes pre-resume snapshots (Lightning SWA callback persistence)."""
    from flax import serialization

    from parseq_tpu.train import optim
    from parseq_tpu.train.loop import train
    from parseq_tpu.utils.registry import create_model

    # swa_epoch_start=0.0 -> snapshots at step 1 then every epoch;
    # limit_train_batches=0.125 -> 2 steps/epoch, so the resumed run's step 3
    # crosses a snapshot point. (Until round 5 the swa_epoch_start key was
    # silently dropped by the loop — the trainer-key guard now rejects
    # unknown keys — and this test only passed because the 0.75 default
    # rescaled swa_start with each run's max_steps.)
    cfg = _config(data_root)
    cfg['trainer']['swa'] = True
    cfg['trainer']['swa_epoch_start'] = 0.0  # average from the first step
    cfg['trainer']['limit_train_batches'] = 0.125
    state1, _ = train(cfg, tmp_path / 'run1', compute_dtype=jnp.float32, max_steps=2)
    swa_path = tmp_path / 'run1' / 'checkpoints' / 'swa_state.ckpt'
    assert swa_path.exists()

    m = create_model('parseq', **{k: v for k, v in cfg['model'].items() if k != 'name'})
    template = optim.swa_init(m.params)
    swa1 = serialization.from_bytes(template, swa_path.read_bytes())
    n1 = int(np.asarray(swa1['n']))
    assert n1 >= 1

    cfg2 = _config(data_root, ckpt_path=str(tmp_path / 'run1' / 'checkpoints' / 'train_state.ckpt'))
    cfg2['trainer']['swa'] = True
    cfg2['trainer']['swa_epoch_start'] = 0.0
    cfg2['trainer']['limit_train_batches'] = 0.125
    train(cfg2, tmp_path / 'run2', compute_dtype=jnp.float32, max_steps=4)
    swa2 = serialization.from_bytes(template,
                                    (tmp_path / 'run2' / 'checkpoints' / 'swa_state.ckpt').read_bytes())
    assert int(np.asarray(swa2['n'])) > n1  # continued, not restarted
