"""Int8 serving-path quantization (ops/quant.py): op semantics + encoder wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.models import vit
from parseq_tpu.ops import layers, quant


def test_quantize_linear_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    p = {'w': jnp.asarray(rng.standard_normal((64, 32)), jnp.float32) * 0.05,
         'b': jnp.asarray(rng.standard_normal(32), jnp.float32)}
    q = quant.quantize_linear(p)
    assert q['w_q'].dtype == jnp.int8
    w_back = q['w_q'].astype(jnp.float32) * q['w_scale'][None, :]
    # per-out-channel symmetric: max error is half a quantization step
    step = np.asarray(q['w_scale'])
    err = np.abs(np.asarray(w_back) - np.asarray(p['w']))
    assert (err <= 0.5 * step[None, :] + 1e-7).all()


def test_int8_linear_close_to_f32():
    rng = np.random.default_rng(1)
    p = {'w': jnp.asarray(rng.standard_normal((128, 96)), jnp.float32) * 0.03,
         'b': jnp.asarray(rng.standard_normal(96), jnp.float32) * 0.1}
    x = jnp.asarray(rng.standard_normal((4, 7, 128)), jnp.float32)
    want = layers.linear(p, x)
    got = layers.linear(quant.quantize_linear(p), x)  # dispatches on 'w_q'
    assert got.shape == want.shape and got.dtype == want.dtype
    denom = float(jnp.abs(want).max())
    rel = float(jnp.abs(got - want).max()) / denom
    assert rel < 0.02, rel  # two int8 quantizations: ~1% expected


def test_quantized_encoder_matches_bf16_coarsely():
    cfg = vit.ViTConfig(img_size=(16, 32), patch_size=(4, 8), embed_dim=64,
                        depth=3, num_heads=4, class_token=False)
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (2, 16, 32, 3), jnp.float32)

    ref = vit.apply(params, x, cfg)
    qparams = quant.quantize_vit_encoder(params)
    got = vit.apply(qparams, x, cfg)
    assert got.shape == ref.shape
    # final LN normalizes scale; int8 noise accumulates over depth — the bar
    # here is wiring correctness, accuracy is measured end-to-end in
    # experiments/int8_accuracy.py
    err = float(jnp.abs(got - ref).max())
    assert err < 0.35, err
    # untouched pieces are literally the same arrays
    assert qparams['patch_embed'] is params['patch_embed']
    # all eight per-block matmuls are int8
    for grp, keys in (('attn', ('q', 'k', 'v', 'out')), ('mlp', ('fc1', 'fc2'))):
        for k in keys:
            leaf = qparams['blocks'][grp][k]
            assert leaf['w_q'].dtype == jnp.int8
            assert leaf['w_q'].shape[0] == cfg.depth  # stacked for lax.scan


def test_quantize_bundle_parseq_reads():
    from parseq_tpu.utils.registry import create_model

    m = create_model('parseq', dtype=jnp.float32, max_label_length=5,
                     img_size=[16, 32], enc_depth=2, embed_dim=32,
                     enc_num_heads=2, dec_num_heads=4)
    qm = quant.quantize_bundle(m)
    assert qm is not m and qm.params is not m.params
    images = np.zeros((2, 16, 32, 3), np.float32)
    labels, conf = qm.read(images)
    assert len(labels) == 2
    # decoder untouched, encoder matmuls int8
    assert qm.params['decoder'] is m.params['decoder']
    assert qm.params['encoder']['blocks']['attn']['q']['w_q'].dtype == jnp.int8


def test_quantize_bundle_rejects_non_vit():
    from parseq_tpu.utils.registry import create_model

    m = create_model('crnn', dtype=jnp.float32, max_label_length=5, hidden_size=16)
    try:
        quant.quantize_bundle(m)
        raise AssertionError('expected ValueError')
    except ValueError as e:
        assert 'ViT' in str(e)


def test_quantize_tree_paths():
    params = {'a': {'lin': {'w': jnp.ones((4, 3)), 'b': jnp.zeros((3,))}},
              'keep': {'w': jnp.ones((2, 2))}}
    out = quant.quantize_tree(params, [('a', 'lin')])
    assert 'w_q' in out['a']['lin'] and 'w_q' not in out['keep']
    assert out['keep'] is params['keep']
