"""ABINet parity vs torch twin: vision, language, alignment, full iteration."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from parseq_tpu.models import abinet
from parseq_tpu.utils.torch_convert import convert_abinet

from .torch_twin import TwinABINet

# d_model is pinned at 512 by resnet45's output width (resnet.py:27-33), so we
# shrink everything else for CPU speed.
CFG = abinet.ABINetConfig(
    num_tokens=15,  # 12 chars + 3 -> num_classes 13
    max_label_length=7,
    img_size=(32, 64),
    d_model=512, nhead=4, d_inner=128, v_num_layers=1, l_num_layers=2, iter_size=2,
)


@pytest.fixture(scope='module')
def twin_and_params():
    torch.manual_seed(21)
    twin = TwinABINet(num_classes=CFG.num_classes, max_label_length=CFG.max_label_length,
                      img_size=CFG.img_size, d=CFG.d_model, nhead=CFG.nhead,
                      dff=CFG.d_inner, v_layers=CFG.v_num_layers,
                      l_layers=CFG.l_num_layers, iter_size=CFG.iter_size).eval()
    params, stats = convert_abinet(dict(twin.state_dict()))
    return twin, params, stats


@pytest.fixture(scope='module')
def images():
    return np.random.default_rng(0).standard_normal((2, 3, *CFG.img_size), dtype=np.float32)


def test_pe_matches_torch(twin_and_params):
    twin, _, _ = twin_and_params
    pe_t = twin.language.token_encoder.pe[:, 0, :].numpy()  # (T, E)
    pe_j = np.asarray(abinet.sinusoid_pe(CFG.max_length, CFG.d_model))
    np.testing.assert_allclose(pe_j, pe_t[: CFG.max_length], atol=1e-6)


def test_vision_parity(twin_and_params, images):
    twin, params, stats = twin_and_params
    with torch.no_grad():
        want = twin._vision(torch.from_numpy(images))
    got, _ = abinet.vision_forward(params['vision'], stats['vision'], CFG,
                                   jnp.asarray(images.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got['logits']), want['logits'].numpy(), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(got['pt_lengths']), want['pt_lengths'].numpy())


def test_language_parity(twin_and_params):
    twin, params, _ = twin_and_params
    rng = np.random.default_rng(1)
    tokens = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, CFG.max_length, CFG.num_classes), dtype=np.float32)))
    lengths = np.array([3, 8], np.int32)
    with torch.no_grad():
        want = twin._language(torch.from_numpy(np.asarray(tokens)), torch.from_numpy(lengths.astype(np.int64)))
    got = abinet.language_forward(params['language'], CFG, tokens, jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got['logits']), want['logits'].numpy(), atol=1e-3)


def test_full_iteration_parity(twin_and_params, images):
    twin, params, stats = twin_and_params
    with torch.no_grad():
        a_t, l_t, v_t = twin(torch.from_numpy(images))
    all_a, all_l, v_res, _ = abinet.forward(params, stats, CFG,
                                            jnp.asarray(images.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(all_a[-1]['logits']), a_t['logits'].numpy(), atol=3e-3)
    np.testing.assert_array_equal(
        np.asarray(all_a[-1]['logits']).argmax(-1), a_t['logits'].numpy().argmax(-1))
    logits = abinet.inference_logits(params, stats, CFG, jnp.asarray(images.transpose(0, 2, 3, 1)))
    assert logits.shape == (2, CFG.max_length, CFG.num_classes)


def test_get_length():
    # logits whose argmax hits null at position 2 -> length 3
    C = CFG.num_classes
    logits = np.full((2, 5, C), -1.0, np.float32)
    logits[0, :, 1] = 1.0
    logits[0, 2, 0] = 5.0  # null at t=2
    logits[1, :, 2] = 1.0  # never null
    out = abinet.get_length(jnp.asarray(logits), CFG)
    assert out.tolist() == [3, 5]


def test_abinet_train_grads_finite(twin_and_params, images):
    _, params, stats = twin_and_params

    def loss_fn(p):
        all_a, all_l, v_res, _ = abinet.forward(p, stats, CFG,
                                                jnp.asarray(images.transpose(0, 2, 3, 1)),
                                                train=False)
        tgt = jnp.zeros((2, CFG.max_length), jnp.int32)
        total = 0.0
        for res in [v_res] + all_l + all_a:
            logp = jax.nn.log_softmax(res['logits'], -1)
            total += -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], -1))
        return total

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_sv_attention_variant_parity():
    """abinet-sv 'attention' module (attention.py:7-32) parity."""
    import torch as _torch

    from parseq_tpu.utils.torch_convert import _lin, _np
    from .torch_twin import TwinSVAttention

    _torch.manual_seed(5)
    # n_feature must equal H*W (reference wires n_feature=8*32 for the 8x32
    # feature map, model_vision.py:28-31)
    T, E, n_feat = CFG.max_length, CFG.d_model, 32
    twin = TwinSVAttention(E, T, n_feat).eval()
    x = np.random.default_rng(0).standard_normal((2, E, 4, 8), dtype=np.float32)
    want = twin(_torch.from_numpy(x)).numpy()

    sd = {f'a.{k}': v for k, v in twin.state_dict().items()}
    p = {
        'f0_embedding': {'w': jnp.asarray(_np(sd['a.f0_embedding.weight']))},
        'w0': _lin(sd, 'a.w0'), 'wv': _lin(sd, 'a.wv'), 'we': _lin(sd, 'a.we'),
    }
    got, _ = abinet._sv_attention(p, CFG, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
