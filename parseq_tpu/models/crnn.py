"""CRNN: VGG-style CNN -> 2x BiLSTM -> CTC.

Reference: /root/reference/strhub/models/crnn/model.py:6-62 (7-conv stack
with asymmetric pooling collapsing height to 1, two BidirectionalLSTM
blocks) and base.py:204-221 (CTCSystem loss/decoding).

TPU-first: NHWC convs, lax.scan LSTMs with the input projection hoisted to
one batched matmul, native CTC loss (ops.ctc). BatchNorm keeps running
stats as a separate `stats` tree (functional state threading).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from parseq_tpu.ops import cnn, ctc, layers, rnn

# (kernel, stride, pad, out_ch, batchnorm) per conv, reference model.py:12-41
_CONVS = [
    (3, 1, 1, 64, False),
    (3, 1, 1, 128, False),
    (3, 1, 1, 256, True),
    (3, 1, 1, 256, False),
    (3, 1, 1, 512, True),
    (3, 1, 1, 512, False),
    (2, 1, 0, 512, True),
]
# max-pools applied after conv index: {idx: (kernel, stride, pad)}
_POOLS = {
    0: ((2, 2), (2, 2), (0, 0)),
    1: ((2, 2), (2, 2), (0, 0)),
    3: ((2, 2), (2, 1), (0, 1)),
    5: ((2, 2), (2, 1), (0, 1)),
}


@dataclass(frozen=True)
class CRNNConfig:
    num_tokens: int = 37  # charset + BLANK
    max_label_length: int = 25
    img_size: tuple[int, int] = (32, 128)
    in_chans: int = 3
    hidden_size: int = 256
    leaky_relu: bool = False

    @property
    def blank_id(self) -> int:
        return 0


def init(key, cfg: CRNNConfig):
    assert cfg.img_size[0] % 16 == 0, 'image height must be a multiple of 16'
    ks = jax.random.split(key, len(_CONVS) + 2)
    convs, stats = [], []
    cin = cfg.in_chans
    for i, (k, s, p, cout, bn) in enumerate(_CONVS):
        conv = {'conv': cnn.conv2d_init(ks[i], k, k, cin, cout, bias=not bn)}
        if bn:
            conv['bn'] = cnn.batchnorm_init(cout)
            stats.append(cnn.batchnorm_stats_init(cout))
        convs.append(conv)
        cin = cout
    params = {
        'cnn': convs,
        'rnn0': rnn.bilstm_init(ks[-2], 512, cfg.hidden_size, cfg.hidden_size),
        'rnn1': rnn.bilstm_init(ks[-1], cfg.hidden_size, cfg.hidden_size, cfg.num_tokens),
    }
    return params, {'bn': stats}


def forward(params, stats, cfg: CRNNConfig, images, *, train=False, dtype=jnp.float32):
    """(B, H, W, 3) -> (logits (B, T, num_tokens), new_stats). T = W/4 + 1."""
    x = images.astype(dtype)
    new_bn = []
    bn_i = 0
    for i, (k, s, p, cout, bn) in enumerate(_CONVS):
        x = cnn.conv2d(params['cnn'][i]['conv'], x, stride=(s, s), padding=(p, p))
        if bn:
            x, st = cnn.batchnorm(params['cnn'][i]['bn'], stats['bn'][bn_i], x, train=train)
            new_bn.append(st)
            bn_i += 1
        x = jax.nn.leaky_relu(x, 0.2) if cfg.leaky_relu else jax.nn.relu(x)
        if i in _POOLS:
            pk, ps, pp = _POOLS[i]
            x = cnn.max_pool2d(x, pk, ps, pp)
    B, H, W, C = x.shape
    assert H == 1, f'feature height must be 1, got {H}'
    x = x.reshape(B, W, C)
    x = rnn.bilstm(params['rnn0'], x)
    x = rnn.bilstm(params['rnn1'], x)
    return x.astype(jnp.float32), {'bn': new_bn}


def logits_loss(params, stats, cfg: CRNNConfig, images, targets, target_lengths,
                *, train=False, dtype=jnp.float32):
    """CTC loss (CTCSystem.forward_logits_loss, base.py:213-221).
    targets: (B, L) CTCTokenizer-encoded; lengths: (B,).
    Returns (logits, loss, batch_size, new_stats)."""
    logits, new_stats = forward(params, stats, cfg, images, train=train, dtype=dtype)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = ctc.ctc_loss(log_probs, targets, target_lengths, blank=cfg.blank_id)
    return logits, loss, images.shape[0], new_stats
