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
