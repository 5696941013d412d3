"""CRNN + CTC: op parity vs torch, loss parity vs torch/optax, model parity."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from parseq_tpu.models import crnn
from parseq_tpu.ops import cnn as cnn_ops
from parseq_tpu.ops import ctc as ctc_ops
from parseq_tpu.ops import rnn as rnn_ops
from parseq_tpu.utils.torch_convert import convert_crnn

from .torch_twin import TwinCRNN


def test_lstm_matches_torch():
    torch.manual_seed(0)
    m = torch.nn.LSTM(8, 16, batch_first=True, bidirectional=True)
    x = np.random.default_rng(0).standard_normal((3, 11, 8), dtype=np.float32)
    want, _ = m(torch.from_numpy(x))
    sd = {f'rnn.{k}': v for k, v in m.state_dict().items()}
    from parseq_tpu.utils.torch_convert import _lstm_dir

    pf = _lstm_dir(sd, 'rnn')
    pb = _lstm_dir(sd, 'rnn', '_reverse')
    got = np.concatenate([
        np.asarray(rnn_ops.lstm(pf, jnp.asarray(x))),
        np.asarray(rnn_ops.lstm(pb, jnp.asarray(x), reverse=True)),
    ], axis=-1)
    np.testing.assert_allclose(got, want.detach().numpy(), atol=2e-5)


def test_maxpool_matches_torch():
    x = np.random.default_rng(0).standard_normal((2, 8, 33, 4), dtype=np.float32)
    want = torch.nn.MaxPool2d((2, 2), (2, 1), (0, 1))(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = cnn_ops.max_pool2d(jnp.asarray(x), (2, 2), (2, 1), (0, 1))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), atol=1e-6)


def test_batchnorm_matches_torch_train_and_eval():
    torch.manual_seed(1)
    bn = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(5) + 0.5)
        bn.bias.copy_(torch.rand(5))
    x = np.random.default_rng(0).standard_normal((4, 6, 7, 5), dtype=np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    p = {'scale': jnp.asarray(bn.weight.detach().numpy()), 'bias': jnp.asarray(bn.bias.detach().numpy())}
    stats = {'mean': jnp.zeros(5), 'var': jnp.ones(5)}

    bn.train()
    want = bn(xt).detach().numpy()
    got, new_stats = cnn_ops.batchnorm(p, stats, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_stats['mean']), bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats['var']), bn.running_var.numpy(), atol=1e-4)

    bn.eval()
    want_eval = bn(xt).detach().numpy()
    got_eval, _ = cnn_ops.batchnorm(p, new_stats, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_eval).transpose(0, 3, 1, 2), want_eval, atol=1e-4)


@pytest.mark.parametrize('seed', [0, 1])
def test_ctc_loss_matches_torch(seed):
    rng = np.random.default_rng(seed)
    B, T, C, L = 4, 19, 12, 7
    logits = rng.standard_normal((B, T, C), dtype=np.float32)
    lengths = np.array([7, 3, 1, 5], np.int32)
    targets = rng.integers(1, C, (B, L)).astype(np.int32)

    log_probs = torch.from_numpy(logits).log_softmax(-1)
    want = F.ctc_loss(
        log_probs.transpose(0, 1), torch.from_numpy(targets.astype(np.int64)),
        torch.full((B,), T, dtype=torch.long), torch.from_numpy(lengths.astype(np.int64)),
        blank=0, zero_infinity=True,
    ).item()
    got = float(ctc_ops.ctc_loss(
        jax.nn.log_softmax(jnp.asarray(logits), -1), jnp.asarray(targets), jnp.asarray(lengths)
    ))
    assert got == pytest.approx(want, abs=1e-4)

    # per-sample vs optax
    import optax

    pad_mask = np.zeros((B, T), np.float32)
    tgt_pad = np.where(np.arange(L)[None] < lengths[:, None], targets, 0)
    opt = optax.ctc_loss(jnp.asarray(logits), jnp.asarray(pad_mask),
                         jnp.asarray(tgt_pad),
                         jnp.asarray((np.arange(L)[None] >= lengths[:, None]).astype(np.float32)))
    ours = ctc_ops.ctc_loss(jax.nn.log_softmax(jnp.asarray(logits), -1),
                            jnp.asarray(targets), jnp.asarray(lengths), reduction='none')
    np.testing.assert_allclose(np.asarray(ours), np.asarray(opt), atol=1e-3)


def test_crnn_parity_eval():
    torch.manual_seed(5)
    twin = TwinCRNN(img_h=32, nc=3, nclass=37, nh=64).eval()
    params, stats = convert_crnn(dict(twin.state_dict()))
    cfg = crnn.CRNNConfig(num_tokens=37, hidden_size=64)
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 128), dtype=np.float32)
    want = twin(torch.from_numpy(x)).numpy()
    got, _ = crnn.forward(params, stats, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == want.shape  # (B, 33, 37)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(got).argmax(-1), want.argmax(-1))


def test_crnn_train_loss_finite_and_decreases():
    import optax

    cfg = crnn.CRNNConfig(num_tokens=12, hidden_size=32)
    params, stats = crnn.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    images = rng.standard_normal((4, 32, 128, 3)).astype(np.float32)
    targets = rng.integers(1, 12, (4, 8)).astype(np.int32)
    lengths = np.array([8, 4, 2, 6], np.int32)

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt):
        def loss_fn(p):
            _, loss, _, new_stats = crnn.logits_loss(
                p, stats, cfg, jnp.asarray(images), jnp.asarray(targets),
                jnp.asarray(lengths), train=True)
            return loss, new_stats

        (loss, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), new_stats, opt, loss

    losses = []
    for _ in range(6):
        params, stats, opt, loss = step(params, stats, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ctc_loss_empty_target_matches_torch():
    """target_length == 0 must return -log p(all-blank), not double-count the
    single alpha cell (reference torch semantics; ADVICE.md round-1 finding)."""
    rng = np.random.default_rng(7)
    B, T, C, L = 3, 11, 9, 5
    logits = rng.standard_normal((B, T, C), dtype=np.float32)
    lengths = np.array([0, 3, 0], np.int32)
    targets = rng.integers(1, C, (B, L)).astype(np.int32)

    log_probs = torch.from_numpy(logits).log_softmax(-1)
    want = F.ctc_loss(
        log_probs.transpose(0, 1), torch.from_numpy(targets.astype(np.int64)),
        torch.full((B,), T, dtype=torch.long), torch.from_numpy(lengths.astype(np.int64)),
        blank=0, zero_infinity=True, reduction='none',
    ).numpy()
    got = np.asarray(ctc_ops.ctc_loss(
        jax.nn.log_softmax(jnp.asarray(logits), -1), jnp.asarray(targets),
        jnp.asarray(lengths), reduction='none'))
    np.testing.assert_allclose(got, want, atol=1e-4)
