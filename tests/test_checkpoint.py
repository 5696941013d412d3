"""Checkpoint I/O: top-k retention semantics (reference train.py:86-92)."""

import numpy as np

from parseq_tpu.utils.checkpoint import load_checkpoint, save_topk


def _params(v):
    return {'w': np.full((2,), float(v), np.float32)}


def test_save_topk_keeps_best_k_and_returns_best(tmp_path):
    d = tmp_path / 'ck'
    best = None
    for step, metric in [(1, 0.5), (2, 0.9), (3, 0.7), (4, 0.1), (5, 0.8)]:
        best = save_topk(d, step, metric, _params(metric), k=3)
    kept = sorted(p.name for p in d.glob('step=*.ckpt'))
    assert kept == ['step=2-metric=0.9000.ckpt', 'step=3-metric=0.7000.ckpt',
                    'step=5-metric=0.8000.ckpt']
    # the returned path is the best *surviving* checkpoint, not the last
    # written one (which at metric=0.8 ranks second)
    assert best.name == 'step=2-metric=0.9000.ckpt'
    assert best.exists()
    params, _, meta = load_checkpoint(best)
    assert float(np.asarray(params['w'])[0]) == np.float32(0.9)
    assert meta['metric'] == 0.9
    # last.ckpt always tracks the most recent save
    _, _, last_meta = load_checkpoint(d / 'last.ckpt')
    assert last_meta['step'] == 5


def test_save_topk_below_topk_write_is_pruned(tmp_path):
    d = tmp_path / 'ck'
    for step, metric in [(1, 0.9), (2, 0.8), (3, 0.7)]:
        save_topk(d, step, metric, _params(metric), k=3)
    ret = save_topk(d, 4, 0.1, _params(0.1), k=3)
    assert not (d / 'step=4-metric=0.1000.ckpt').exists()
    assert ret.exists() and 'metric=0.9000' in ret.name
