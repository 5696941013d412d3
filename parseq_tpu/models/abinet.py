"""ABINet: vision model + BCN cloze language model + iterative gated fusion.

Reference: /root/reference/strhub/models/abinet/
  resnet.py:18-72           resnet45 (1x1-then-3x3 BasicBlocks, [3,4,6,6,3])
  backbone.py:8-24          ResTranformer (resnet45 + 2 post-LN encoder layers)
  attention.py:7-100        PositionAttention (U-Net key path) / Attention (sv)
  model_language.py:7-49    BCN LM: cross-attn-only decoder, diagonal
                            location mask, padding by predicted length
  model_alignment.py:7-28   gated fusion
  model_abinet_iter.py:24-39 iter_size refinement loop
  model.py:12-31            length-from-logits, location mask
  system.py:37-215          staged training (pretrain -> joint), per-submodel
                            losses and LM learning rate

All fixed-shape; the iteration loop is a static Python loop (iter_size=3).
BatchNorm stats are threaded functionally (stats tree mirrors params).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.ops import cnn, layers
from parseq_tpu.ops.layers import dropout, layer_norm, linear, mha


@dataclass(frozen=True)
class ABINetConfig:
    num_tokens: int = 97  # len(charset) + 3; num_classes = num_tokens - 2
    max_label_length: int = 25
    img_size: tuple[int, int] = (32, 128)
    d_model: int = 512
    nhead: int = 8
    d_inner: int = 2048
    dropout: float = 0.1
    activation: str = 'relu'
    v_backbone: str = 'transformer'  # or 'resnet45'
    v_num_layers: int = 3
    v_attention: str = 'position'  # or 'attention'
    v_attention_mode: str = 'nearest'
    l_num_layers: int = 4
    l_use_self_attn: bool = False
    l_detach: bool = True
    iter_size: int = 3
    v_loss_weight: float = 1.0
    l_loss_weight: float = 1.0
    a_loss_weight: float = 1.0

    @property
    def max_length(self) -> int:
        return self.max_label_length + 1  # + stop token

    @property
    def num_classes(self) -> int:
        return self.num_tokens - 2

    @property
    def null_label(self) -> int:
        return 0  # EOS

    @property
    def pad_id(self) -> int:
        return self.num_tokens - 1

    @property
    def feat_hw(self) -> tuple[int, int]:
        return (self.img_size[0] // 4, self.img_size[1] // 4)  # resnet45 /4


# ---------------------------------------------------------------------------
# Positional encoding (transformer.py:157-198) — constant, computed on the fly
# ---------------------------------------------------------------------------


def sinusoid_pe(length, d_model):
    pos = np.arange(length)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((length, d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe, jnp.float32)  # (T, E)


# ---------------------------------------------------------------------------
# resnet45
# ---------------------------------------------------------------------------

_R45_PLANES = [32, 64, 128, 256, 512]
_R45_BLOCKS = [3, 4, 6, 6, 3]
_R45_STRIDES = [2, 1, 2, 1, 1]


def _conv_bn_init(key, k, cin, cout):
    return ({'conv': cnn.conv2d_init(key, k, k, cin, cout, bias=False),
             'bn': cnn.batchnorm_init(cout)},
            cnn.batchnorm_stats_init(cout))


def _r45_block_init(key, cin, cout, stride):
    ks = layers.split_rngs(key, ['c1', 'c2', 'down'])
    p1, s1 = _conv_bn_init(ks['c1'], 1, cin, cout)  # 1x1
    p2, s2 = _conv_bn_init(ks['c2'], 3, cout, cout)  # 3x3 with stride
    p, s = {'conv1': p1, 'conv2': p2}, {'conv1': s1, 'conv2': s2}
    if stride != 1 or cin != cout:
        p['down'], s['down'] = _conv_bn_init(ks['down'], 1, cin, cout)
    return p, s


def resnet45_init(key):
    ks = jax.random.split(key, 6)
    p, s = {}, {}
    p['stem'], s['stem'] = _conv_bn_init(ks[0], 3, 3, 32)
    cin = 32
    for li, (planes, blocks, stride) in enumerate(zip(_R45_PLANES, _R45_BLOCKS, _R45_STRIDES)):
        bp, bs = [], []
        for bi in range(blocks):
            kp = jax.random.fold_in(ks[li + 1], bi)
            pb, sb = _r45_block_init(kp, cin if bi == 0 else planes, planes,
                                     stride if bi == 0 else 1)
            bp.append(pb)
            bs.append(sb)
        p[f'layer{li + 1}'], s[f'layer{li + 1}'] = bp, bs
        cin = planes
    return p, s


def _r45_block(p, s, x, stride, *, train=False):
    ns = {}
    out = cnn.conv2d(p['conv1']['conv'], x, stride=(1, 1), padding=(0, 0))
    out, ns['conv1'] = cnn.batchnorm(p['conv1']['bn'], s['conv1'], out, train=train)
    out = jax.nn.relu(out)
    out = cnn.conv2d(p['conv2']['conv'], out, stride=(stride, stride), padding=(1, 1))
    out, ns['conv2'] = cnn.batchnorm(p['conv2']['bn'], s['conv2'], out, train=train)
    if 'down' in p:
        x = cnn.conv2d(p['down']['conv'], x, stride=(stride, stride), padding=(0, 0))
        x, ns['down'] = cnn.batchnorm(p['down']['bn'], s['down'], x, train=train)
    return jax.nn.relu(out + x), ns


def resnet45(p, s, x, *, train=False):
    ns = {}
    x = cnn.conv2d(p['stem']['conv'], x, stride=(1, 1), padding=(1, 1))
    x, ns['stem'] = cnn.batchnorm(p['stem']['bn'], s['stem'], x, train=train)
    x = jax.nn.relu(x)
    for li, (blocks, stride) in enumerate(zip(_R45_BLOCKS, _R45_STRIDES)):
        bs = []
        for bi in range(blocks):
            x, n = _r45_block(p[f'layer{li + 1}'][bi], s[f'layer{li + 1}'][bi], x,
                              stride if bi == 0 else 1, train=train)
            bs.append(n)
        ns[f'layer{li + 1}'] = bs
    return x, ns  # (B, H/4, W/4, 512)


# ---------------------------------------------------------------------------
# Post-LN transformer layers (torch defaults; backbone + BCN decoder)
# ---------------------------------------------------------------------------


def _enc_layer_init(key, cfg: ABINetConfig):
    ks = layers.split_rngs(key, ['attn', 'l1', 'l2'])
    return {
        'self_attn': layers.mha_init(ks['attn'], cfg.d_model),
        'linear1': layers.linear_init(ks['l1'], cfg.d_model, cfg.d_inner),
        'linear2': layers.linear_init(ks['l2'], cfg.d_inner, cfg.d_model),
        'norm1': layers.layer_norm_init(cfg.d_model),
        'norm2': layers.layer_norm_init(cfg.d_model),
    }


def _act(cfg):
    return jax.nn.relu if cfg.activation == 'relu' else layers.gelu


def _enc_layer(p, cfg, x, *, drop=0.0, rng=None):
    r = [None] * 4 if rng is None else list(jax.random.split(rng, 4))
    # Length-gated fused attention: at ABINet's L = 256 (>= KERNEL_MIN_LEN)
    # the einsum path's padded (B, h, L, L) f32 score traffic dominates the
    # sublayer; the pallas no-split kernel keeps scores in VMEM (same
    # mechanism measured for ViTSTR at L=197, ops/attention.py). The routing
    # layer itself falls back to layers.mha when dropout is active (the
    # reference drops attention probabilities, which the kernel doesn't
    # implement) or off-TPU.
    from parseq_tpu.ops.attention import encoder_self_attention

    a = encoder_self_attention(p['self_attn'], x, cfg.nhead,
                               dropout_rate=drop, rng=r[0])
    x = layer_norm(p['norm1'], x + dropout(a, drop, r[1]))
    h = _act(cfg)(linear(p['linear1'], x))
    h = linear(p['linear2'], dropout(h, drop, r[2]))
    return layer_norm(p['norm2'], x + dropout(h, drop, r[3]))


def _dec_layer_init(key, cfg: ABINetConfig):
    ks = layers.split_rngs(key, ['self', 'cross', 'l1', 'l2'])
    p = {
        'multihead_attn': layers.mha_init(ks['cross'], cfg.d_model),
        'linear1': layers.linear_init(ks['l1'], cfg.d_model, cfg.d_inner),
        'linear2': layers.linear_init(ks['l2'], cfg.d_inner, cfg.d_model),
        'norm2': layers.layer_norm_init(cfg.d_model),
        'norm3': layers.layer_norm_init(cfg.d_model),
    }
    if cfg.l_use_self_attn:
        p['self_attn'] = layers.mha_init(ks['self'], cfg.d_model)
        p['norm1'] = layers.layer_norm_init(cfg.d_model)
    return p


def _dec_layer(p, cfg, tgt, memory, *, memory_bias=None, memory_kpm=None,
               tgt_kpm=None, drop=0.0, rng=None):
    """Vendored pre-torch TransformerDecoderLayer (transformer.py:115-154),
    post-LN, optional self-attn."""
    r = [None] * 6 if rng is None else list(jax.random.split(rng, 6))
    if 'self_attn' in p:
        a = mha(p['self_attn'], tgt, tgt, tgt, num_heads=cfg.nhead,
                key_padding_mask=tgt_kpm, dropout_rate=drop, rng=r[0])
        tgt = layer_norm(p['norm1'], tgt + dropout(a, drop, r[1]))
    a = mha(p['multihead_attn'], tgt, memory, memory, num_heads=cfg.nhead,
            attn_bias=memory_bias, key_padding_mask=memory_kpm,
            dropout_rate=drop, rng=r[2])
    tgt = layer_norm(p['norm2'], tgt + dropout(a, drop, r[3]))
    h = _act(cfg)(linear(p['linear1'], tgt))
    h = linear(p['linear2'], dropout(h, drop, r[4]))
    return layer_norm(p['norm3'], tgt + dropout(h, drop, r[5]))


# ---------------------------------------------------------------------------
# Vision model
# ---------------------------------------------------------------------------


def _pos_attention_init(key, cfg: ABINetConfig, num_channels=64):
    E = cfg.d_model
    ks = layers.split_rngs(key, ['e0', 'e1', 'e2', 'e3', 'd0', 'd1', 'd2', 'd3', 'proj'])
    enc, enc_s, dec, dec_s = [], [], [], []
    cin = E
    for i in range(4):
        p, s = ({'conv': cnn.conv2d_init(ks[f'e{i}'], 3, 3, cin, num_channels, bias=True),
                 'bn': cnn.batchnorm_init(num_channels)}, cnn.batchnorm_stats_init(num_channels))
        enc.append(p)
        enc_s.append(s)
        cin = num_channels
    for i in range(4):
        cout = E if i == 3 else num_channels
        p, s = ({'conv': cnn.conv2d_init(ks[f'd{i}'], 3, 3, num_channels, cout, bias=True),
                 'bn': cnn.batchnorm_init(cout)}, cnn.batchnorm_stats_init(cout))
        dec.append(p)
        dec_s.append(s)
    params = {'k_encoder': enc, 'k_decoder': dec,
              'project': layers.linear_init(ks['proj'], E, E)}
    stats = {'k_encoder': enc_s, 'k_decoder': dec_s}
    return params, stats


def _upsample_nearest(x, size):
    return jax.image.resize(x, (x.shape[0], *size, x.shape[-1]), method='nearest')


def _pos_attention(p, s, cfg: ABINetConfig, x, *, train=False):
    """PositionAttention (attention.py:54-100). x: (B, H, W, E) -> (B, T, E)."""
    B, H, W, E = x.shape
    ns = {'k_encoder': [], 'k_decoder': []}
    k = x
    feats = []
    strides = [(1, 2), (2, 2), (2, 2), (2, 2)]
    for i in range(4):
        k = cnn.conv2d(p['k_encoder'][i]['conv'], k, stride=strides[i], padding=(1, 1))
        k, n = cnn.batchnorm(p['k_encoder'][i]['bn'], s['k_encoder'][i], k, train=train)
        k = jax.nn.relu(k)
        ns['k_encoder'].append(n)
        feats.append(k)
    for i in range(3):
        k = _upsample_nearest(k, (k.shape[1] * 2, k.shape[2] * 2))
        k = cnn.conv2d(p['k_decoder'][i]['conv'], k, stride=(1, 1), padding=(1, 1))
        k, n = cnn.batchnorm(p['k_decoder'][i]['bn'], s['k_decoder'][i], k, train=train)
        k = jax.nn.relu(k)
        ns['k_decoder'].append(n)
        k = k + feats[2 - i]
    k = _upsample_nearest(k, (H, W))
    k = cnn.conv2d(p['k_decoder'][3]['conv'], k, stride=(1, 1), padding=(1, 1))
    k, n = cnn.batchnorm(p['k_decoder'][3]['bn'], s['k_decoder'][3], k, train=train)
    k = jax.nn.relu(k)
    ns['k_decoder'].append(n)

    T = cfg.max_length
    q = jnp.broadcast_to(sinusoid_pe(T, E)[None].astype(x.dtype), (B, T, E))
    q = linear(p['project'], q)
    scores = jnp.einsum('bte,bhwe->bthw', q, k).reshape(B, T, H * W) / math.sqrt(E)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    v = x.reshape(B, H * W, E)
    return jnp.einsum('btn,bne->bte', attn, v), ns


def _sv_attention_init(key, cfg: ABINetConfig, n_feature=256):
    E = cfg.d_model
    T = cfg.max_length
    ks = layers.split_rngs(key, ['f0', 'w0', 'wv', 'we'])
    return {
        'f0_embedding': layers.embedding_init(ks['f0'], T, E),
        'w0': layers.linear_init(ks['w0'], T, n_feature),
        'wv': layers.linear_init(ks['wv'], E, E),
        'we': layers.linear_init(ks['we'], E, T),
    }


def _sv_attention(p, cfg: ABINetConfig, x):
    """Attention variant (attention.py:7-32) used by abinet-sv."""
    B, H, W, E = x.shape
    enc = x.reshape(B, H * W, E)
    T = cfg.max_length
    order = jnp.arange(T)
    emb = layers.embedding(p['f0_embedding'], order, enc.dtype)  # (T, E)
    t = linear(p['w0'], jnp.broadcast_to(emb.T[None], (B, E, T)))  # (B, E, n)
    t = jnp.tanh(t.transpose(0, 2, 1) + linear(p['wv'], enc))  # (B, n, E)
    attn = jax.nn.softmax(linear(p['we'], t).transpose(0, 2, 1).astype(jnp.float32), axis=2)
    return (attn.astype(enc.dtype) @ enc), None


def vision_init(key, cfg: ABINetConfig):
    ks = layers.split_rngs(key, ['resnet', 'tf', 'attn', 'cls'])
    rp, rs = resnet45_init(ks['resnet'])
    params = {'resnet': rp, 'cls': layers.linear_init(ks['cls'], cfg.d_model, cfg.num_classes)}
    stats = {'resnet': rs}
    if cfg.v_backbone == 'transformer':
        params['transformer'] = [_enc_layer_init(jax.random.fold_in(ks['tf'], i), cfg)
                                 for i in range(cfg.v_num_layers)]
    if cfg.v_attention == 'position':
        params['attention'], stats['attention'] = _pos_attention_init(ks['attn'], cfg)
    else:
        params['attention'] = _sv_attention_init(ks['attn'], cfg)
    return params, stats


def vision_forward(p, s, cfg: ABINetConfig, images, *, train=False, drop=0.0, rng=None):
    ns = {}
    x, ns['resnet'] = resnet45(p['resnet'], s['resnet'], images, train=train)
    B, H, W, E = x.shape
    if cfg.v_backbone == 'transformer':
        seq = x.reshape(B, H * W, E) + sinusoid_pe(H * W, E)[None].astype(x.dtype)
        rngs = [None] * cfg.v_num_layers if rng is None else list(jax.random.split(rng, cfg.v_num_layers))
        for i, lp in enumerate(p['transformer']):
            seq = _enc_layer(lp, cfg, seq, drop=drop, rng=rngs[i])
        x = seq.reshape(B, H, W, E)
    if cfg.v_attention == 'position':
        attn_vecs, n = _pos_attention(p['attention'], s['attention'], cfg, x, train=train)
        ns['attention'] = n
    else:
        attn_vecs, _ = _sv_attention(p['attention'], cfg, x)
    logits = linear(p['cls'], attn_vecs).astype(jnp.float32)
    return {'feature': attn_vecs, 'logits': logits,
            'pt_lengths': get_length(logits, cfg)}, ns


# ---------------------------------------------------------------------------
# Language + alignment
# ---------------------------------------------------------------------------


def language_init(key, cfg: ABINetConfig):
    ks = layers.split_rngs(key, ['proj', 'layers', 'cls'])
    return {
        'proj': layers.linear_init(ks['proj'], cfg.num_classes, cfg.d_model, bias=False),
        'layers': [_dec_layer_init(jax.random.fold_in(ks['layers'], i), cfg)
                   for i in range(cfg.l_num_layers)],
        'cls': layers.linear_init(ks['cls'], cfg.d_model, cfg.num_classes),
    }


def language_forward(p, cfg: ABINetConfig, tokens, lengths, *, detach=None,
                     drop=0.0, rng=None):
    """BCN language model (model_language.py:26-49).
    tokens: (B, T, num_classes) probabilities; lengths: (B,)."""
    detach = cfg.l_detach if detach is None else detach
    if detach:
        tokens = jax.lax.stop_gradient(tokens)
    T = cfg.max_length
    embed = linear(p['proj'], tokens)  # (B, T, E)
    pe = sinusoid_pe(T, cfg.d_model)[None].astype(embed.dtype)
    rngs = [None] * (cfg.l_num_layers + 1) if rng is None else list(jax.random.split(rng, cfg.l_num_layers + 1))
    embed = dropout(embed + pe, drop, rngs[-1])  # token_encoder has dropout
    query = jnp.broadcast_to(pe, embed.shape)  # pos_encoder: dropout=0
    padding_mask = jnp.arange(T)[None, :] >= lengths[:, None]  # (B, T)
    # location mask: -inf on the diagonal (can't see own position)
    loc_bias = jnp.where(jnp.eye(T, dtype=bool), layers.NEG_INF, 0.0).astype(jnp.float32)
    out = query
    for i, lp in enumerate(p['layers']):
        out = _dec_layer(lp, cfg, out, embed, memory_bias=loc_bias,
                         memory_kpm=padding_mask, tgt_kpm=padding_mask,
                         drop=drop, rng=rngs[i])
    logits = linear(p['cls'], out).astype(jnp.float32)
    return {'feature': out, 'logits': logits, 'pt_lengths': get_length(logits, cfg)}


def alignment_init(key, cfg: ABINetConfig):
    k1, k2 = jax.random.split(key)
    return {
        'w_att': layers.linear_init(k1, 2 * cfg.d_model, cfg.d_model),
        'cls': layers.linear_init(k2, cfg.d_model, cfg.num_classes),
    }


def alignment_forward(p, cfg: ABINetConfig, l_feature, v_feature):
    f = jnp.concatenate([l_feature, v_feature], axis=-1)
    gate = jax.nn.sigmoid(linear(p['w_att'], f))
    out = gate * v_feature + (1 - gate) * l_feature
    logits = linear(p['cls'], out).astype(jnp.float32)
    return {'logits': logits, 'pt_lengths': get_length(logits, cfg)}


def get_length(logits, cfg: ABINetConfig):
    """First position predicting the null (EOS) label, + 1; else T
    (model.py:12-19)."""
    T = logits.shape[1]
    is_null = jnp.argmax(logits, axis=-1) == cfg.null_label
    any_null = jnp.any(is_null, axis=-1)
    first = jnp.argmax(is_null, axis=-1) + 1
    return jnp.where(any_null, first, T)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def init(key, cfg: ABINetConfig):
    ks = layers.split_rngs(key, ['vision', 'language', 'alignment'])
    vp, vs = vision_init(ks['vision'], cfg)
    params = {'vision': vp, 'language': language_init(ks['language'], cfg),
              'alignment': alignment_init(ks['alignment'], cfg)}
    return params, {'vision': vs}


def forward(params, stats, cfg: ABINetConfig, images, *, train=False, drop=0.0, rng=None):
    """Iterative inference (model_abinet_iter.py:24-39).
    Returns (all_a_res, all_l_res, v_res, new_stats)."""
    rngs = [None] * (1 + cfg.iter_size) if rng is None else list(jax.random.split(rng, 1 + cfg.iter_size))
    v_res, ns = vision_forward(params['vision'], stats['vision'], cfg, images,
                               train=train, drop=drop, rng=rngs[0])
    a_res = v_res
    all_l, all_a = [], []
    for i in range(cfg.iter_size):
        tokens = jax.nn.softmax(a_res['logits'], axis=-1)
        lengths = jnp.clip(a_res['pt_lengths'], 2, cfg.max_length)
        l_res = language_forward(params['language'], cfg, tokens.astype(images.dtype),
                                 lengths, drop=drop, rng=rngs[1 + i])
        all_l.append(l_res)
        a_res = alignment_forward(params['alignment'], cfg, l_res['feature'], v_res['feature'])
        all_a.append(a_res)
    return all_a, all_l, v_res, {'vision': ns}


def inference_logits(params, stats, cfg: ABINetConfig, images, dtype=jnp.float32):
    """system.py:142-145: final alignment logits, truncated to max_length + 1
    (== max_length here since T == max_label_length + 1)."""
    all_a, _, _, _ = forward(params, stats, cfg, images.astype(dtype))
    return all_a[-1]['logits']
