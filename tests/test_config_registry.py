import numpy as np
import pytest

from parseq_tpu.utils import config as config_lib
from parseq_tpu.utils.registry import create_model, load_from_checkpoint


def test_compose_default():
    cfg = config_lib.compose()
    assert cfg['model']['name'] == 'parseq'
    assert len(cfg['model']['charset_train']) == 94
    assert cfg['model']['embed_dim'] == 384
    assert cfg['model']['lr'] == 7e-4
    assert cfg['data']['batch_size'] == 384
    assert cfg['trainer']['max_epochs'] == 20


def test_compose_experiment_overlay():
    cfg = config_lib.compose('parseq-tiny')
    assert cfg['model']['name'] == 'parseq-tiny'
    assert cfg['model']['embed_dim'] == 192
    assert cfg['model']['enc_depth'] == 12  # inherited from base model group
    cfg224 = config_lib.compose('parseq-patch16-224')
    assert cfg224['model']['img_size'] == [224, 224]


def test_compose_charset_and_overrides():
    cfg = config_lib.compose('parseq', charset='36_lowercase',
                             overrides={'model.lr': 1e-3, 'trainer.devices': 4})
    assert len(cfg['model']['charset_train']) == 36
    assert cfg['model']['lr'] == 1e-3
    assert cfg['trainer']['devices'] == 4


def test_parse_model_args():
    got = config_lib.parse_model_args(['refine_iters:int=2', 'decode_ar:bool=false', 'lr:float=1e-4'])
    assert got == {'refine_iters': 2, 'decode_ar': False, 'lr': 1e-4}


def test_create_model_and_native_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    # tiny overrides to keep CPU test fast
    model = create_model(
        'parseq-tiny', dtype=jnp.float32,
        img_size=[16, 32], enc_depth=2, max_label_length=5, embed_dim=48,
        enc_num_heads=4, dec_num_heads=4,
    )
    assert model.cfg.num_tokens == 97
    images = np.random.default_rng(0).standard_normal((2, 16, 32, 3)).astype(np.float32)
    labels, conf = model.read(images)
    assert len(labels) == 2 and len(conf) == 2

    from parseq_tpu.utils.checkpoint import save_checkpoint

    p = tmp_path / 'model.ckpt'
    save_checkpoint(p, model.params, model.cfg, meta={'name': 'parseq-tiny', 'model_config': model.raw_config})
    loaded = load_from_checkpoint(str(p), dtype=jnp.float32)
    labels2, conf2 = loaded.read(images)
    assert labels2 == labels
    np.testing.assert_allclose(conf2, conf, rtol=1e-5)


def test_load_torch_checkpoint(tmp_path):
    """A reference-schema torch .pt file loads via on-the-fly conversion."""
    import torch
    import jax.numpy as jnp

    from .torch_twin import TwinPARSeq

    torch.manual_seed(0)
    twin = TwinPARSeq(num_tokens=97, max_label_length=5, img_size=(16, 32),
                      patch_size=(4, 8), d=48, enc_heads=4, enc_mlp=4,
                      enc_depth=2, dec_heads=4, dec_mlp=4, dec_depth=1).eval()
    p = tmp_path / 'parseq_test.pt'
    torch.save(twin.state_dict(), p)
    model = load_from_checkpoint(str(p), dtype=jnp.float32, img_size=[16, 32],
                                 enc_depth=2, max_label_length=5, embed_dim=48,
                                 enc_num_heads=4, dec_num_heads=4)
    images = np.random.default_rng(0).standard_normal((2, 16, 32, 3)).astype(np.float32)
    got = np.asarray(model(images))
    with torch.no_grad():
        want = twin(torch.from_numpy(images.transpose(0, 3, 1, 2)),
                    decode_ar=True, refine_iters=1).numpy()
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_compose_override_propagates_to_data():
    """model.batch_size/img_size overrides must flow into data.* (the
    reference's Hydra interpolation data.batch_size: ${model.batch_size});
    regression test for the empty-drop_last-loader hang."""
    cfg = config_lib.compose('parseq', overrides={'model.batch_size': 4,
                                                  'model.img_size': [16, 32]})
    assert cfg['data']['batch_size'] == 4
    assert cfg['data']['img_size'] == [16, 32]
    # explicit data override wins over the interpolation
    cfg2 = config_lib.compose('parseq', overrides={'model.batch_size': 4,
                                                   'data.batch_size': 8})
    assert cfg2['data']['batch_size'] == 8


def test_bench_tune_config_files():
    """configs/bench.yaml + tune.yaml exist (reference configs parity) and
    feed the CLIs' argparse defaults."""
    from parseq_tpu.cli.bench import _bench_defaults
    from parseq_tpu.cli.tune import _tune_defaults

    b = _bench_defaults()
    assert b['model'] == 'parseq' and b['batch_size'] == 1
    t = _tune_defaults()
    assert t['num_samples'] == 10
    assert float(t['lr']['min']) == 1e-4 and float(t['lr']['max']) == 2e-3


def test_model_config_keys_reach_the_model_or_fail_loudly():
    """Every model.* override must either reach the model config or raise.

    Regression test for the round-5 finding: `model.bulk_bits_uint8=true`
    passed through the config system into the saved run config but the
    family builder's explicit field list silently dropped it — an entire
    e2e validation run trained WITHOUT the lever it was validating (the
    run was bit-identical to the prior round's, which is how it was
    caught). The registry now tracks which keys the builder consumed and
    refuses unknown ones (reference equivalence: hydra struct configs
    reject unknown fields)."""
    from parseq_tpu.utils.registry import InvalidModelError, create_model

    m = create_model('parseq', charset_train='ab', bulk_bits_uint8=True,
                     shared_perm_dropout=False, bulk_dropout_bits=True)
    assert m.cfg.bulk_bits_uint8 is True

    with pytest.raises(InvalidModelError, match='bulk_bits_uint9'):
        create_model('parseq', charset_train='ab', bulk_bits_uint9=True)
    with pytest.raises(InvalidModelError, match='hidden_size'):
        # valid for crnn/trba, not for parseq — must not silently no-op
        create_model('parseq', charset_train='ab', hidden_size=256)
