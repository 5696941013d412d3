"""TRBA / TRBC: TPS rectification -> FAN ResNet -> BiLSTMs -> attention (or CTC).

Reference: /root/reference/strhub/models/trba/
  transformation.py:7-169  (TPS spatial transformer: localization net +
                            thin-plate-spline grid generator)
  feature_extraction.py:6-110 (FAN ResNet, BasicBlocks [1, 2, 5, 3])
  prediction.py:6-73       (attention LSTM decoder: teacher-forced train /
                            greedy eval)
  model.py:9-55, system.py:32-125

TPU-first: the TPS grid solve is two batched matmuls against precomputed
constants; the warp is our gather-based grid_sample; both decode loops are
lax.scans with the encoder projection hoisted out; BatchNorm stats are
threaded functionally through a stats tree that mirrors the params tree.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.ops import cnn, layers, rnn
from parseq_tpu.ops.grid_sample import grid_sample
from parseq_tpu.ops.layers import linear


@dataclass(frozen=True)
class TRBAConfig:
    num_tokens: int = 97  # len(charset) + EOS/BOS/PAD
    max_label_length: int = 25
    img_size: tuple[int, int] = (32, 128)
    in_chans: int = 3
    num_fiducial: int = 20
    output_channel: int = 512
    hidden_size: int = 256
    num_char_embeddings: int = 256
    use_ctc: bool = False  # TRBC

    @property
    def num_steps(self) -> int:
        return self.max_label_length + 1

    @property
    def eos_id(self) -> int:
        return 0

    @property
    def bos_id(self) -> int:
        return self.num_tokens - 2

    @property
    def pad_id(self) -> int:
        return self.num_tokens - 1


# ---------------------------------------------------------------------------
# TPS constants (GridGenerator, transformation.py:96-169) — pure numpy,
# computed once per config.
# ---------------------------------------------------------------------------


def _build_C(F):
    x = np.linspace(-1.0, 1.0, F // 2)
    top = np.stack([x, -np.ones(F // 2)], axis=1)
    bot = np.stack([x, np.ones(F // 2)], axis=1)
    return np.concatenate([top, bot], axis=0)  # (F, 2)


def _build_inv_delta_C(F, C):
    hat_C = np.zeros((F, F))
    for i in range(F):
        for j in range(i, F):
            hat_C[i, j] = hat_C[j, i] = np.linalg.norm(C[i] - C[j])
    np.fill_diagonal(hat_C, 1)
    hat_C = (hat_C ** 2) * np.log(hat_C)
    delta_C = np.concatenate([
        np.concatenate([np.ones((F, 1)), C, hat_C], axis=1),
        np.concatenate([np.zeros((2, 3)), C.T], axis=1),
        np.concatenate([np.zeros((1, 3)), np.ones((1, F))], axis=1),
    ], axis=0)
    return np.linalg.inv(delta_C)  # (F+3, F+3)


def _build_P(W, H):
    gx = (np.arange(-W, W, 2) + 1.0) / W
    gy = (np.arange(-H, H, 2) + 1.0) / H
    return np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)  # (H*W, 2)


def _build_P_hat(F, C, P, eps=1e-6):
    n = P.shape[0]
    d = P[:, None, :] - C[None, :, :]
    r = np.linalg.norm(d, axis=2)
    rbf = (r ** 2) * np.log(r + eps)
    return np.concatenate([np.ones((n, 1)), P, rbf], axis=1)  # (n, F+3)


def tps_constants(cfg: TRBAConfig):
    F = cfg.num_fiducial
    C = _build_C(F)
    H, W = cfg.img_size
    return (
        jnp.asarray(_build_inv_delta_C(F, C), jnp.float32),
        jnp.asarray(_build_P_hat(F, C, _build_P(W, H)), jnp.float32),
    )


def _loc_initial_bias(F):
    """RARE Fig. 6(a) fiducial init (transformation.py:69-76)."""
    x = np.linspace(-1.0, 1.0, F // 2)
    top = np.stack([x, np.linspace(0.0, -1.0, F // 2)], axis=1)
    bot = np.stack([x, np.linspace(1.0, 0.0, F // 2)], axis=1)
    return np.concatenate([top, bot], axis=0).reshape(-1)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _conv_bn_init(key, k, cin, cout, init='kaiming'):
    p = {'conv': cnn.conv2d_init(key, k, k, cin, cout, bias=False),
         'bn': cnn.batchnorm_init(cout)}
    return p, cnn.batchnorm_stats_init(cout)


def _basic_block_init(key, cin, cout, stride=1):
    ks = layers.split_rngs(key, ['c1', 'c2', 'down'])
    p1, s1 = _conv_bn_init(ks['c1'], 3, cin, cout)
    p2, s2 = _conv_bn_init(ks['c2'], 3, cout, cout)
    p = {'conv1': p1, 'conv2': p2}
    s = {'conv1': s1, 'conv2': s2}
    if stride != 1 or cin != cout:
        pd, sd = _conv_bn_init(ks['down'], 1, cin, cout)
        p['down'], s['down'] = pd, sd
    return p, s


def _layer_init(key, n_blocks, cin, cout, stride=1):
    keys = jax.random.split(key, n_blocks)
    blocks, stats = [], []
    for i, k in enumerate(keys):
        p, s = _basic_block_init(k, cin if i == 0 else cout, cout, stride if i == 0 else 1)
        blocks.append(p)
        stats.append(s)
    return blocks, stats


def init(key, cfg: TRBAConfig):
    oc = cfg.output_channel
    ks = layers.split_rngs(key, [
        'loc0', 'loc1', 'loc2', 'loc3', 'loc_fc1', 'loc_fc2',
        'stem1', 'stem2', 'layer1', 'conv1', 'layer2', 'conv2',
        'layer3', 'conv3', 'layer4', 'conv4_1', 'conv4_2',
        'rnn0', 'rnn1', 'pred',
    ])
    params, stats = {}, {}

    # --- TPS localization network (transformation.py:46-67)
    loc, loc_s = {}, {}
    cin = cfg.in_chans
    for i, cout in enumerate([64, 128, 256, 512]):
        loc[f'conv{i}'], loc_s[f'conv{i}'] = _conv_bn_init(ks[f'loc{i}'], 3, cin, cout)
        cin = cout
    loc['fc1'] = layers.linear_init(ks['loc_fc1'], 512, 256)
    loc['fc2'] = {'w': jnp.zeros((256, cfg.num_fiducial * 2), jnp.float32),
                  'b': jnp.asarray(_loc_initial_bias(cfg.num_fiducial), jnp.float32)}
    params['loc'], stats['loc'] = loc, loc_s

    # --- FAN ResNet (feature_extraction.py:20-110)
    rn, rn_s = {}, {}
    ocb = [oc // 4, oc // 2, oc, oc]
    rn['stem1'], rn_s['stem1'] = _conv_bn_init(ks['stem1'], 3, cfg.in_chans, oc // 16)
    rn['stem2'], rn_s['stem2'] = _conv_bn_init(ks['stem2'], 3, oc // 16, oc // 8)
    rn['layer1'], rn_s['layer1'] = _layer_init(ks['layer1'], 1, oc // 8, ocb[0])
    rn['conv1'], rn_s['conv1'] = _conv_bn_init(ks['conv1'], 3, ocb[0], ocb[0])
    rn['layer2'], rn_s['layer2'] = _layer_init(ks['layer2'], 2, ocb[0], ocb[1])
    rn['conv2'], rn_s['conv2'] = _conv_bn_init(ks['conv2'], 3, ocb[1], ocb[1])
    rn['layer3'], rn_s['layer3'] = _layer_init(ks['layer3'], 5, ocb[1], ocb[2])
    rn['conv3'], rn_s['conv3'] = _conv_bn_init(ks['conv3'], 3, ocb[2], ocb[2])
    rn['layer4'], rn_s['layer4'] = _layer_init(ks['layer4'], 3, ocb[2], ocb[3])
    # conv4_1: k2 stride (2,1) pad (0,1); conv4_2: k2 s1 p0
    rn['conv4_1'] = {'conv': cnn.conv2d_init(ks['conv4_1'], 2, 2, ocb[3], ocb[3], bias=False),
                     'bn': cnn.batchnorm_init(ocb[3])}
    rn_s['conv4_1'] = cnn.batchnorm_stats_init(ocb[3])
    rn['conv4_2'] = {'conv': cnn.conv2d_init(ks['conv4_2'], 2, 2, ocb[3], ocb[3], bias=False),
                     'bn': cnn.batchnorm_init(ocb[3])}
    rn_s['conv4_2'] = cnn.batchnorm_stats_init(ocb[3])
    params['resnet'], stats['resnet'] = rn, rn_s

    # --- sequence modeling + prediction
    params['rnn0'] = rnn.bilstm_init(ks['rnn0'], oc, cfg.hidden_size, cfg.hidden_size)
    params['rnn1'] = rnn.bilstm_init(ks['rnn1'], cfg.hidden_size, cfg.hidden_size, cfg.hidden_size)
    kp = layers.split_rngs(ks['pred'], ['i2h', 'h2h', 'score', 'rnn', 'gen', 'emb'])
    if cfg.use_ctc:
        params['pred'] = layers.linear_init(kp['gen'], cfg.hidden_size, cfg.num_tokens)
    else:
        H, E = cfg.hidden_size, cfg.num_char_embeddings
        bound = 1.0 / np.sqrt(H)
        u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
        params['pred'] = {
            'i2h': layers.linear_init(kp['i2h'], H, H, bias=False),
            'h2h': layers.linear_init(kp['h2h'], H, H),
            'score': layers.linear_init(kp['score'], H, 1, bias=False),
            'cell': {  # torch LSTMCell layout (transposed)
                'wih': u(jax.random.split(kp['rnn'])[0], (H + E, 4 * H)),
                'whh': u(jax.random.split(kp['rnn'])[1], (H, 4 * H)),
                'bih': jnp.zeros((4 * H,)), 'bhh': jnp.zeros((4 * H,)),
            },
            'generator': layers.linear_init(kp['gen'], H, cfg.num_tokens),
            'char_embeddings': layers.embedding_init(kp['emb'], cfg.num_tokens, E),
        }
    return params, stats


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def _conv_bn(p, s, x, *, stride=(1, 1), padding=(1, 1), train=False, relu=True):
    y = cnn.conv2d(p['conv'], x, stride=stride, padding=padding)
    y, ns = cnn.batchnorm(p['bn'], s, y, train=train)
    if relu:
        y = jax.nn.relu(y)
    return y, ns


def tps(params, stats, cfg: TRBAConfig, images, constants, *, train=False):
    """Rectify images with the TPS STN (transformation.py:27-40)."""
    x = images
    ns = {}
    for i in range(4):
        x, ns[f'conv{i}'] = _conv_bn(params[f'conv{i}'], stats[f'conv{i}'], x, train=train)
        if i < 3:
            x = cnn.max_pool2d(x, (2, 2), (2, 2))
    x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
    x = jax.nn.relu(linear(params['fc1'], x))
    C_prime = linear(params['fc2'], x).reshape(-1, cfg.num_fiducial, 2)

    inv_delta_C, P_hat = constants
    B = C_prime.shape[0]
    Cz = jnp.concatenate([C_prime, jnp.zeros((B, 3, 2), C_prime.dtype)], axis=1)
    T = inv_delta_C.astype(C_prime.dtype) @ Cz  # (B, F+3, 2)
    P_prime = jnp.einsum('nf,bfd->bnd', P_hat.astype(C_prime.dtype), T)
    grid = P_prime.reshape(B, cfg.img_size[0], cfg.img_size[1], 2)
    return grid_sample(images, grid), ns


def _basic_block(p, s, x, *, stride=1, train=False):
    ns = {}
    out, ns['conv1'] = _conv_bn(p['conv1'], s['conv1'], x, stride=(stride, stride), train=train)
    out = cnn.conv2d(p['conv2']['conv'], out, stride=(1, 1), padding=(1, 1))
    out, ns['conv2'] = cnn.batchnorm(p['conv2']['bn'], s['conv2'], out, train=train)
    if 'down' in p:
        x = cnn.conv2d(p['down']['conv'], x, stride=(stride, stride), padding=(0, 0))
        x, ns['down'] = cnn.batchnorm(p['down']['bn'], s['down'], x, train=train)
    return jax.nn.relu(out + x), ns


def _layer(ps, ss, x, *, train=False):
    ns = []
    for p, s in zip(ps, ss):
        x, n = _basic_block(p, s, x, train=train)
        ns.append(n)
    return x, ns


def resnet(params, stats, x, *, train=False):
    """FAN ResNet (feature_extraction.py:76-110). x: (B, H, W, C) -> (B, 1, W', oc)."""
    ns = {}
    x, ns['stem1'] = _conv_bn(params['stem1'], stats['stem1'], x, train=train)
    x, ns['stem2'] = _conv_bn(params['stem2'], stats['stem2'], x, train=train)
    x = cnn.max_pool2d(x, (2, 2), (2, 2))
    x, ns['layer1'] = _layer(params['layer1'], stats['layer1'], x, train=train)
    x, ns['conv1'] = _conv_bn(params['conv1'], stats['conv1'], x, train=train)
    x = cnn.max_pool2d(x, (2, 2), (2, 2))
    x, ns['layer2'] = _layer(params['layer2'], stats['layer2'], x, train=train)
    x, ns['conv2'] = _conv_bn(params['conv2'], stats['conv2'], x, train=train)
    x = cnn.max_pool2d(x, (2, 2), (2, 1), (0, 1))
    x, ns['layer3'] = _layer(params['layer3'], stats['layer3'], x, train=train)
    x, ns['conv3'] = _conv_bn(params['conv3'], stats['conv3'], x, train=train)
    x, ns['layer4'] = _layer(params['layer4'], stats['layer4'], x, train=train)
    x, ns['conv4_1'] = _conv_bn(params['conv4_1'], stats['conv4_1'], x,
                                stride=(2, 1), padding=(0, 1), train=train)
    x, ns['conv4_2'] = _conv_bn(params['conv4_2'], stats['conv4_2'], x,
                                stride=(1, 1), padding=(0, 0), train=train)
    return x, ns


def _attention_step(p, h, c, ctx_proj, batch_H, emb):
    """One AttentionCell step (prediction.py:60-73)."""
    e = linear(p['score'], jnp.tanh(ctx_proj + linear(p['h2h'], h)[:, None, :]))  # (B, T, 1)
    alpha = jax.nn.softmax(e, axis=1)
    context = jnp.sum(alpha * batch_H, axis=1)  # (B, H_feat)
    x = jnp.concatenate([context, emb], axis=-1)
    x_proj = x @ p['cell']['wih'].astype(x.dtype) + p['cell']['bih'].astype(x.dtype)
    return rnn.lstm_cell(p['cell'], x_proj, h, c)


def attention_decode(p, cfg: TRBAConfig, batch_H, text=None, dtype=jnp.float32):
    """Teacher-forced when `text` (B, num_steps) given, else greedy from BOS.
    Returns logits (B, num_steps, num_tokens)."""
    B = batch_H.shape[0]
    H = cfg.hidden_size
    ctx_proj = linear(p['i2h'], batch_H)  # hoisted encoder projection
    emb_table = p['char_embeddings']

    def embed(ids):
        return layers.embedding(emb_table, ids, dtype)

    h0 = jnp.zeros((B, H), dtype)
    c0 = jnp.zeros((B, H), dtype)

    if text is not None:
        def step(carry, ids):
            h, c = carry
            h, c = _attention_step(p, h, c, ctx_proj, batch_H, embed(ids))
            return (h, c), h

        _, hs = jax.lax.scan(step, (h0, c0), text.T[: cfg.num_steps])
        return linear(p['generator'], hs.transpose(1, 0, 2)).astype(jnp.float32)

    def step(carry, _):
        h, c, ids = carry
        h, c = _attention_step(p, h, c, ctx_proj, batch_H, embed(ids))
        logits_t = linear(p['generator'], h)
        nxt = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
        return (h, c, nxt), logits_t

    init_ids = jnp.full((B,), cfg.bos_id, jnp.int32)
    _, logits = jax.lax.scan(step, (h0, c0, init_ids), None, length=cfg.num_steps)
    return logits.transpose(1, 0, 2).astype(jnp.float32)


def forward(params, stats, cfg: TRBAConfig, images, *, text=None, train=False,
            dtype=jnp.float32, constants=None):
    """Full TRBA/TRBC forward. Returns (logits, new_stats).

    TRBA: logits (B, num_steps, num_tokens) — AR attention decode (greedy
    unless teacher-forcing `text` is given). TRBC: (B, W', num_tokens) CTC.
    """
    if constants is None:
        constants = tps_constants(cfg)
    x = images.astype(dtype)
    ns = {}
    x, ns['loc'] = tps(params['loc'], stats['loc'], cfg, x, constants, train=train)
    x, ns['resnet'] = resnet(params['resnet'], stats['resnet'], x, train=train)
    # (B, h, W', C) -> average over h (AdaptiveAvgPool2d((None, 1)) after the
    # reference's permute puts h last; model.py:44-46)
    x = jnp.mean(x, axis=1)  # (B, W', C)
    x = rnn.bilstm(params['rnn0'], x)
    x = rnn.bilstm(params['rnn1'], x)
    if cfg.use_ctc:
        logits = linear(params['pred'], x).astype(jnp.float32)
    else:
        logits = attention_decode(params['pred'], cfg, x, text=text, dtype=dtype)
    return logits, ns
