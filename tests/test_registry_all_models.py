"""Every model family builds from config groups and runs read() end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from parseq_tpu.utils.registry import create_model

TINY = dict(max_label_length=5)


@pytest.mark.parametrize('name,kwargs,img', [
    ('parseq', dict(img_size=[16, 32], enc_depth=1, embed_dim=32,
                    enc_num_heads=2, dec_num_heads=4), (16, 32)),
    ('parseq-tiny', dict(img_size=[16, 32], enc_depth=1, embed_dim=48,
                         enc_num_heads=3, dec_num_heads=6), (16, 32)),
    ('vitstr', dict(img_size=[32, 32], patch_size=[8, 8], depth=1,
                    embed_dim=32, num_heads=4), (32, 32)),
    ('crnn', dict(hidden_size=16), (32, 128)),
    ('trba', dict(output_channel=32, hidden_size=16, num_fiducial=6), (32, 128)),
    ('trbc', dict(output_channel=32, hidden_size=16, num_fiducial=6), (32, 128)),
    ('abinet', dict(d_inner=64, v_num_layers=1, l_num_layers=1, iter_size=1, nhead=4), (32, 128)),
])
def test_create_and_read(name, kwargs, img):
    m = create_model(name, dtype=jnp.float32, **TINY, **kwargs)
    images = np.zeros((2, *img, 3), np.float32)
    labels, conf = m.read(images)
    assert len(labels) == 2 and len(conf) == 2
    assert all(isinstance(l, str) for l in labels)
