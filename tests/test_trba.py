"""TRBA/TRBC parity vs torch twin: grid_sample op, TPS, full forwards."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from parseq_tpu.models import trba
from parseq_tpu.ops.grid_sample import grid_sample
from parseq_tpu.utils.torch_convert import convert_trba

from .torch_twin import TwinTRBA


@pytest.mark.parametrize('method', ['gather', 'onehot'])
def test_grid_sample_matches_torch(method):
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 8, 12), dtype=np.float32)
    grid = (rng.random((2, 5, 7, 2), dtype=np.float32) * 2.4 - 1.2)  # incl. out-of-bounds
    want = F.grid_sample(torch.from_numpy(imgs), torch.from_numpy(grid),
                         padding_mode='border', align_corners=True).numpy()
    got = grid_sample(jnp.asarray(imgs.transpose(0, 2, 3, 1)), jnp.asarray(grid),
                      method=method)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_grid_sample_onehot_grads_match_gather():
    """Both paths must agree on d/dimages and d/dgrid (TPS trains through this)."""
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.standard_normal((2, 6, 9, 3), dtype=np.float32))
    grid = jnp.asarray(rng.random((2, 4, 5, 2), dtype=np.float32) * 1.8 - 0.9)

    def loss(method):
        return lambda im, g: jnp.sum(jnp.sin(grid_sample(im, g, method=method)))

    gi_1, gg_1 = jax.grad(loss('gather'), argnums=(0, 1))(imgs, grid)
    gi_2, gg_2 = jax.grad(loss('onehot'), argnums=(0, 1))(imgs, grid)
    np.testing.assert_allclose(np.asarray(gi_1), np.asarray(gi_2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg_1), np.asarray(gg_2), atol=1e-4)


@pytest.fixture(scope='module')
def twin_and_params():
    torch.manual_seed(11)
    twin = TwinTRBA(num_class=15, img_size=(32, 64), F_fid=6, oc=32, nh=16,
                    max_label_length=6, num_char_embeddings=16).eval()
    params, stats = convert_trba(dict(twin.state_dict()))
    return twin, params, stats


@pytest.fixture(scope='module')
def cfg():
    return trba.TRBAConfig(num_tokens=15, max_label_length=6, img_size=(32, 64),
                           num_fiducial=6, output_channel=32, hidden_size=16,
                           num_char_embeddings=16)


@pytest.fixture(scope='module')
def images():
    return np.random.default_rng(0).standard_normal((2, 3, 32, 64), dtype=np.float32)


def test_tps_parity(twin_and_params, cfg, images):
    twin, params, stats = twin_and_params
    with torch.no_grad():
        want = twin._tps(torch.from_numpy(images)).numpy()
    consts = trba.tps_constants(cfg)
    got, _ = trba.tps(params['loc'], stats['loc'], cfg,
                      jnp.asarray(images.transpose(0, 2, 3, 1)), consts)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_trba_greedy_parity(twin_and_params, cfg, images):
    twin, params, stats = twin_and_params
    want = twin(torch.from_numpy(images)).numpy()
    got, _ = trba.forward(params, stats, cfg, jnp.asarray(images.transpose(0, 2, 3, 1)))
    assert got.shape == want.shape == (2, 7, 15)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(got).argmax(-1), want.argmax(-1))


def test_trba_teacher_forced_parity(twin_and_params, cfg, images):
    twin, params, stats = twin_and_params
    rng = np.random.default_rng(1)
    text = rng.integers(0, 14, (2, 7)).astype(np.int64)
    text[:, 0] = twin.bos_id
    want = twin(torch.from_numpy(images), torch.from_numpy(text)).numpy()
    got, _ = trba.forward(params, stats, cfg, jnp.asarray(images.transpose(0, 2, 3, 1)),
                          text=jnp.asarray(text.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_trbc_parity(images):
    torch.manual_seed(12)
    twin = TwinTRBA(num_class=13, img_size=(32, 64), F_fid=6, oc=32, nh=16,
                    max_label_length=6, use_ctc=True).eval()
    params, stats = convert_trba(dict(twin.state_dict()), use_ctc=True)
    cfg = trba.TRBAConfig(num_tokens=13, max_label_length=6, img_size=(32, 64),
                          num_fiducial=6, output_channel=32, hidden_size=16, use_ctc=True)
    want = twin(torch.from_numpy(images)).numpy()
    got, _ = trba.forward(params, stats, cfg, jnp.asarray(images.transpose(0, 2, 3, 1)))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_trba_train_grad_finite(cfg):
    params, stats = trba.init(jax.random.key(0), cfg)
    consts = trba.tps_constants(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((2, 32, 64, 3)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 12, (2, 7)).astype(np.int32))
    targets = jnp.asarray(rng.integers(0, 12, (2, 7)).astype(np.int32))

    def loss_fn(p):
        logits, _ = trba.forward(p, stats, cfg, images, text=text, train=True, constants=consts)
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], -1))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.sum(jnp.square(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gn) and gn > 0
