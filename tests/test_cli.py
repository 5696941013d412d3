"""CLI end-to-end smoke tests: evaluation suite + tune (CPU, tiny configs)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from .test_lmdb import _png_bytes, make_str_db

REPO = Path(__file__).resolve().parents[1]
ENV = {**os.environ, 'JAX_PLATFORMS': 'cpu'}


def test_test_cli_full_benchmark_tables(tmp_path):
    from parseq_tpu.data.module import TEST_BENCHMARK, TEST_BENCHMARK_SUB
    from parseq_tpu.utils.checkpoint import save_checkpoint
    from parseq_tpu.utils.registry import create_model

    root = tmp_path / 'data'
    for name in sorted(set(TEST_BENCHMARK + TEST_BENCHMARK_SUB)):
        make_str_db(root / 'test' / name, [(_png_bytes(), 'ab'), (_png_bytes(), 'cde')])

    m = create_model('parseq-tiny', dtype=jnp.float32, enc_depth=1, embed_dim=48,
                     enc_num_heads=3, dec_num_heads=6, max_label_length=5,
                     img_size=[16, 32])
    ckpt = tmp_path / 'model.ckpt'
    save_checkpoint(ckpt, m.params, m.cfg,
                    meta={'name': 'parseq-tiny', 'model_config': m.raw_config})

    import contextlib
    import io as _io

    from parseq_tpu.cli.test import main as test_main

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        test_main([str(ckpt), '--data_root', str(root),
                   '--batch_size', '4', '--num_workers', '0'])
    out = buf.getvalue()
    assert 'Benchmark (Subset) set:' in out
    assert '| Combined' in out
    assert 'IIIT5k' in out
    # log file written next to the checkpoint (reference test.py:139-143)
    log = Path(str(ckpt) + '.log.txt')
    assert log.exists() and 'Combined' in log.read_text()


def test_tune_cli_successive_halving(tmp_path):
    import io

    from PIL import Image, ImageDraw

    def img_bytes(text):
        im = Image.new('RGB', (48, 16), (255, 255, 255))
        ImageDraw.Draw(im).text((1, 1), text, fill=(0, 0, 0))
        b = io.BytesIO()
        im.save(b, 'PNG')
        return b.getvalue()

    root = tmp_path / 'data'
    words = ['ab', 'cd', 'ef', 'gh']
    make_str_db(root / 'train' / 'real' / 's', [(img_bytes(w), w) for w in words * 4])
    make_str_db(root / 'val' / 's', [(img_bytes(w), w) for w in words])

    import contextlib
    import io as _io

    from parseq_tpu.cli.tune import main as tune_main

    # Two trials are affordable on the 1-CPU runner because tune reuses one
    # compiled train step across LRs (runtime-injected LR): the second trial
    # must be a pure cache hit.
    from parseq_tpu.train import loop as train_loop

    train_loop._COMPILE_CACHE.clear()
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        tune_main(['--num_samples', '2', '--rung_steps', '2', '--rungs', '1',
                   '--work_dir', str(tmp_path / 'tune'),
                   'model.img_size=[16,32]', 'model.enc_depth=1', 'model.embed_dim=32',
                   'model.enc_num_heads=2', 'model.dec_num_heads=4',
                   'model.max_label_length=5', 'model.batch_size=4',
                   'model.decode_ar=false', 'model.refine_iters=0',
                   f'data.root_dir={root}', 'data.num_workers=0', 'data.augment=false',
                   'trainer.devices=1', 'trainer.swa=false'])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert 'best_lr' in out and np.isfinite(out['best_lr'])
    assert (tmp_path / 'tune' / 'results.json').exists()
    results = json.loads((tmp_path / 'tune' / 'results.json').read_text())
    assert len(results) == 2 and results[0]['lr'] != results[1]['lr']
    # both trials shared one compiled step bundle
    assert len(train_loop._COMPILE_CACHE) == 1


def test_metric_tracker_trend_stopper():
    """Reference tune.py:42-91 semantics: stop on downward/stagnant NED trend."""
    from parseq_tpu.cli.tune import MetricTracker

    # Rising trend: never stopped (until max_t).
    t = MetricTracker('NED', max_t=100, patience=3, window=3)
    rising = [0.1 * i for i in range(1, 12)]
    assert not any(t('up', {'training_iteration': i, 'loss': 1.0, 'NED': v})
                   for i, v in enumerate(rising, 1))

    # Stagnant trend: stopped once the FIFO fills (patience + buffer samples).
    t2 = MetricTracker('NED', max_t=100, patience=3, window=3)
    stopped_at = None
    for i in range(1, 13):
        if t2('flat', {'training_iteration': i, 'loss': 1.0, 'NED': 0.5}):
            stopped_at = i
            break
    # FIFO fills at patience + buffer = 7 samples; flat trend stops there.
    assert stopped_at == 7
    # history cleared after stopping
    assert 'flat' not in t2.trial_history

    # NaN loss stops immediately.
    t3 = MetricTracker('NED', max_t=100)
    assert t3('nan', {'training_iteration': 1, 'loss': float('nan'), 'NED': 0.9})

    # max_t stops.
    t4 = MetricTracker('NED', max_t=5)
    assert t4('late', {'training_iteration': 5, 'loss': 1.0, 'NED': 0.9})


def test_median_stopping_rule():
    from parseq_tpu.cli.tune import MedianStoppingRule

    rule = MedianStoppingRule(grace_period=2, min_samples_required=3)
    # Three good peer trials establish the median.
    for tid, base in [('a', 0.8), ('b', 0.85), ('c', 0.9)]:
        for it in range(1, 5):
            assert not rule.on_result(tid, it, base + 0.01 * it)
    # A bad trial survives the grace period, then gets cut.
    assert not rule.on_result('bad', 1, 0.1)  # within grace
    assert rule.on_result('bad', 3, 0.15)     # best 0.15 < median of peers
    # A good trial is never cut.
    assert not rule.on_result('good', 3, 0.95)


def test_train_loop_val_callback_early_stop(tmp_path):
    """val_callback returning True halts training at that validation."""
    import io

    from PIL import Image, ImageDraw

    from parseq_tpu.train.loop import train
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
    make_str_db(root / 'train' / 'real' / 's', [(img_bytes(w), w) for w in words * 4])
    make_str_db(root / 'val' / 's', [(img_bytes(w), w) for w in words])

    cfg = compose(None, overrides=parse_cli_overrides([
        'model.img_size=[16,32]', 'model.enc_depth=1', 'model.embed_dim=32',
        'model.enc_num_heads=2', 'model.dec_num_heads=4',
        'model.max_label_length=5', 'model.batch_size=4',
        'model.decode_ar=false', 'model.refine_iters=0',
        f'data.root_dir={root}', 'data.num_workers=0', 'data.augment=false',
        'trainer.devices=1', 'trainer.swa=false', 'trainer.val_check_interval=1']))
    calls = []

    def cb(result):
        calls.append(result)
        return True  # stop at the first validation

    train(cfg, tmp_path / 'run', max_steps=8, val_callback=cb)
    assert len(calls) == 1
    assert calls[0]['training_iteration'] == 1 and calls[0]['step'] == 1
