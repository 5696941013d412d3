"""Convert reference PyTorch checkpoints (.pt state_dicts) into our pytrees.

Handles the released weight sets of baudm/parseq
(/root/reference/strhub/models/utils.py:14-22). The state_dict key schema is
fixed by the reference module tree; we map it onto our parameter layout:

  * torch Linear weight (out, in)  ->  ours (in, out)  [transpose]
  * packed MHA in_proj (3D, D)     ->  separate q/k/v   [split + transpose]
  * PatchEmbed Conv2d (D, C, ph, pw) -> matmul weight (ph*pw*C, D)
  * per-layer encoder blocks        -> stacked along a leading depth axis

Works on plain numpy inputs so no torch import is needed at convert time
(torch tensors are accepted and converted).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(x):
    if hasattr(x, 'detach'):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _lin(sd, prefix):
    p = {'w': jnp.asarray(_np(sd[f'{prefix}.weight']).T)}
    if f'{prefix}.bias' in sd:
        p['b'] = jnp.asarray(_np(sd[f'{prefix}.bias']))
    return p


def _ln(sd, prefix):
    return {'scale': jnp.asarray(_np(sd[f'{prefix}.weight'])),
            'bias': jnp.asarray(_np(sd[f'{prefix}.bias']))}


def _mha(sd, prefix):
    """torch nn.MultiheadAttention -> separate q/k/v/out params."""
    w = _np(sd[f'{prefix}.in_proj_weight'])
    b = _np(sd[f'{prefix}.in_proj_bias'])
    d = w.shape[1]
    wq, wk, wv = w.reshape(3, d, d)
    bq, bk, bv = b.reshape(3, d)
    return {
        'q': {'w': jnp.asarray(wq.T), 'b': jnp.asarray(bq)},
        'k': {'w': jnp.asarray(wk.T), 'b': jnp.asarray(bk)},
        'v': {'w': jnp.asarray(wv.T), 'b': jnp.asarray(bv)},
        'out': _lin(sd, f'{prefix}.out_proj'),
    }


def _timm_attn(sd, prefix):
    """timm Attention (packed qkv Linear) -> separate q/k/v/out."""
    w = _np(sd[f'{prefix}.qkv.weight'])
    b = _np(sd[f'{prefix}.qkv.bias'])
    d = w.shape[1]
    wq, wk, wv = w.reshape(3, d, d)
    bq, bk, bv = b.reshape(3, d)
    return {
        'q': {'w': jnp.asarray(wq.T), 'b': jnp.asarray(bq)},
        'k': {'w': jnp.asarray(wk.T), 'b': jnp.asarray(bk)},
        'v': {'w': jnp.asarray(wv.T), 'b': jnp.asarray(bv)},
        'out': _lin(sd, f'{prefix}.proj'),
    }


def _stack(trees):
    """Stack a list of identical pytrees along a new leading axis."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def convert_vit_encoder(sd, prefix='encoder', depth=None):
    """timm VisionTransformer -> vit.init layout (with or without class token)."""
    prefix = f'{prefix}.' if prefix else ''
    if depth is None:
        depth = 1 + max(
            int(k.removeprefix(f'{prefix}blocks.').split('.')[0])
            for k in sd
            if k.startswith(f'{prefix}blocks.')
        )
    if prefix:
        sd = {k.removeprefix(prefix): v for k, v in sd.items() if k.startswith(prefix)}
    conv_w = _np(sd['patch_embed.proj.weight'])  # (D, C, ph, pw)
    # Flatten in (ph, pw, C) order to match vit.patch_embed's patch layout.
    D = conv_w.shape[0]
    w = conv_w.transpose(2, 3, 1, 0).reshape(-1, D)
    blocks = []
    for i in range(depth):
        bp = f'blocks.{i}'
        blocks.append({
            'norm1': _ln(sd, f'{bp}.norm1'),
            'attn': _timm_attn(sd, f'{bp}.attn'),
            'norm2': _ln(sd, f'{bp}.norm2'),
            'mlp': {'fc1': _lin(sd, f'{bp}.mlp.fc1'), 'fc2': _lin(sd, f'{bp}.mlp.fc2')},
        })
    out = {
        'patch_embed': {'w': jnp.asarray(w), 'b': jnp.asarray(_np(sd['patch_embed.proj.bias']))},
        'pos_embed': jnp.asarray(_np(sd['pos_embed'])),
        'blocks': _stack(blocks),
        'norm': _ln(sd, 'norm'),
    }
    if 'cls_token' in sd:
        out['cls_token'] = jnp.asarray(_np(sd['cls_token']))
    return out


def _conv2d(sd, prefix):
    p = {'w': jnp.asarray(_np(sd[f'{prefix}.weight']).transpose(2, 3, 1, 0))}
    if f'{prefix}.bias' in sd:
        p['b'] = jnp.asarray(_np(sd[f'{prefix}.bias']))
    return p


def _bn(sd, prefix):
    params = {'scale': jnp.asarray(_np(sd[f'{prefix}.weight'])),
              'bias': jnp.asarray(_np(sd[f'{prefix}.bias']))}
    stats = {'mean': jnp.asarray(_np(sd[f'{prefix}.running_mean'])),
             'var': jnp.asarray(_np(sd[f'{prefix}.running_var']))}
    return params, stats


def _lstm_dir(sd, prefix, suffix=''):
    return {
        'wih': jnp.asarray(_np(sd[f'{prefix}.weight_ih_l0{suffix}']).T),
        'whh': jnp.asarray(_np(sd[f'{prefix}.weight_hh_l0{suffix}']).T),
        'bih': jnp.asarray(_np(sd[f'{prefix}.bias_ih_l0{suffix}'])),
        'bhh': jnp.asarray(_np(sd[f'{prefix}.bias_hh_l0{suffix}'])),
    }


def _bilstm(sd, prefix):
    """Reference BidirectionalLSTM (modules.py:5-20) -> rnn.bilstm layout."""
    return {
        'fwd': _lstm_dir(sd, f'{prefix}.rnn'),
        'bwd': _lstm_dir(sd, f'{prefix}.rnn', '_reverse'),
        'linear': _lin(sd, f'{prefix}.linear'),
    }


def convert_crnn(sd):
    """Reference CRNN state_dict -> (params, stats) for models/crnn.py."""
    from parseq_tpu.models.crnn import _CONVS

    convs, bn_stats = [], []
    for i, (_, _, _, _, bn) in enumerate(_CONVS):
        c = {'conv': _conv2d(sd, f'cnn.conv{i}')}
        if bn:
            c['bn'], st = _bn(sd, f'cnn.batchnorm{i}')
            bn_stats.append(st)
        convs.append(c)
    params = {
        'cnn': convs,
        'rnn0': _bilstm(sd, 'rnn.0'),
        'rnn1': _bilstm(sd, 'rnn.1'),
    }
    return params, {'bn': bn_stats}


def _conv_bn(sd, conv_prefix, bn_prefix):
    params = {'conv': _conv2d(sd, conv_prefix)}
    params['bn'], stats = _bn(sd, bn_prefix)
    return params, stats


def _basic_block(sd, prefix):
    p1, s1 = _conv_bn(sd, f'{prefix}.conv1', f'{prefix}.bn1')
    p2, s2 = _conv_bn(sd, f'{prefix}.conv2', f'{prefix}.bn2')
    p = {'conv1': p1, 'conv2': p2}
    s = {'conv1': s1, 'conv2': s2}
    if f'{prefix}.downsample.0.weight' in sd:
        p['down'], s['down'] = _conv_bn(sd, f'{prefix}.downsample.0', f'{prefix}.downsample.1')
    return p, s


def _res_layer(sd, prefix, n):
    ps, ss = [], []
    for i in range(n):
        p, s = _basic_block(sd, f'{prefix}.{i}')
        ps.append(p)
        ss.append(s)
    return ps, ss


def convert_tps_loc(sd, prefix='Transformation.'):
    """Reference TPS LocalizationNetwork (trba/transformation.py:42-83) ->
    (loc params, loc stats). Sequential indices 0,1 / 4,5 / 8,9 / 12,13."""
    loc, loc_s = {}, {}
    for i, si in enumerate([0, 4, 8, 12]):
        pfx = f'{prefix}LocalizationNetwork.conv.{si}'
        bfx = f'{prefix}LocalizationNetwork.conv.{si + 1}'
        loc[f'conv{i}'], loc_s[f'conv{i}'] = _conv_bn(sd, pfx, bfx)
    loc['fc1'] = _lin(sd, f'{prefix}LocalizationNetwork.localization_fc1.0')
    loc['fc2'] = _lin(sd, f'{prefix}LocalizationNetwork.localization_fc2')
    return loc, loc_s


def convert_trba(sd, use_ctc=False):
    """Reference TRBA/TRBC state_dict -> (params, stats) for models/trba.py."""
    params, stats = {}, {}
    params['loc'], stats['loc'] = convert_tps_loc(sd)

    rn, rn_s = {}, {}
    cn = 'FeatureExtraction.ConvNet'
    rn['stem1'], rn_s['stem1'] = _conv_bn(sd, f'{cn}.conv0_1', f'{cn}.bn0_1')
    rn['stem2'], rn_s['stem2'] = _conv_bn(sd, f'{cn}.conv0_2', f'{cn}.bn0_2')
    for name, n in [('layer1', 1), ('layer2', 2), ('layer3', 5), ('layer4', 3)]:
        rn[name], rn_s[name] = _res_layer(sd, f'{cn}.{name}', n)
    for name in ['conv1', 'conv2', 'conv3', 'conv4_1', 'conv4_2']:
        rn[name], rn_s[name] = _conv_bn(sd, f'{cn}.{name}', f'{cn}.bn{name.removeprefix("conv")}')
    params['resnet'], stats['resnet'] = rn, rn_s

    params['rnn0'] = _bilstm(sd, 'SequenceModeling.0')
    params['rnn1'] = _bilstm(sd, 'SequenceModeling.1')
    if use_ctc or 'Prediction.weight' in sd:
        params['pred'] = _lin(sd, 'Prediction')
    else:
        params['pred'] = convert_trba_attention(sd)
    return params, stats


def convert_trba_attention(sd, prefix='Prediction.'):
    """Reference TRBA attention decoder (trba/prediction.py:6-73) -> pred params."""
    ac = f'{prefix}attention_cell'
    return {
        'i2h': _lin(sd, f'{ac}.i2h'),
        'h2h': _lin(sd, f'{ac}.h2h'),
        'score': _lin(sd, f'{ac}.score'),
        'cell': {
            'wih': jnp.asarray(_np(sd[f'{ac}.rnn.weight_ih']).T),
            'whh': jnp.asarray(_np(sd[f'{ac}.rnn.weight_hh']).T),
            'bih': jnp.asarray(_np(sd[f'{ac}.rnn.bias_ih'])),
            'bhh': jnp.asarray(_np(sd[f'{ac}.rnn.bias_hh'])),
        },
        'generator': _lin(sd, f'{prefix}generator'),
        'char_embeddings': {'w': jnp.asarray(_np(sd[f'{prefix}char_embeddings.weight']))},
    }


def _abinet_r45(sd, prefix):
    from parseq_tpu.models.abinet import _R45_BLOCKS

    p = {'stem': {'conv': _conv2d(sd, f'{prefix}.conv1')}}
    p['stem']['bn'], st = _bn(sd, f'{prefix}.bn1')
    s = {'stem': st}
    for li, n in enumerate(_R45_BLOCKS):
        p[f'layer{li + 1}'], s[f'layer{li + 1}'] = _res_layer(sd, f'{prefix}.layer{li + 1}', n)
    return p, s


def _enc_layer_conv(sd, prefix):
    return {
        'self_attn': _mha(sd, f'{prefix}.self_attn'),
        'linear1': _lin(sd, f'{prefix}.linear1'),
        'linear2': _lin(sd, f'{prefix}.linear2'),
        'norm1': _ln(sd, f'{prefix}.norm1'),
        'norm2': _ln(sd, f'{prefix}.norm2'),
    }


def convert_abinet_pos_attention(sd, prefix='vision.attention.'):
    """Reference PositionAttention (abinet/attention.py:50-100) -> (params, stats)."""
    enc, enc_s, dec, dec_s = [], [], [], []
    for i in range(4):
        c = {'conv': _conv2d(sd, f'{prefix}k_encoder.{i}.0')}
        c['bn'], st = _bn(sd, f'{prefix}k_encoder.{i}.1')
        enc.append(c)
        enc_s.append(st)
        c = {'conv': _conv2d(sd, f'{prefix}k_decoder.{i}.1')}
        c['bn'], st = _bn(sd, f'{prefix}k_decoder.{i}.2')
        dec.append(c)
        dec_s.append(st)
    params = {'k_encoder': enc, 'k_decoder': dec,
              'project': _lin(sd, f'{prefix}project')}
    stats = {'k_encoder': enc_s, 'k_decoder': dec_s}
    return params, stats


def convert_abinet_language(sd, prefix='language.'):
    """Reference BCNLanguage (abinet/model_language.py:7-49) -> language params."""
    n_l = 1 + max(int(k.removeprefix(f'{prefix}model.layers.').split('.')[0])
                  for k in sd if k.startswith(f'{prefix}model.layers.'))
    lls = []
    for i in range(n_l):
        pfx = f'{prefix}model.layers.{i}'
        lp = {
            'multihead_attn': _mha(sd, f'{pfx}.multihead_attn'),
            'linear1': _lin(sd, f'{pfx}.linear1'),
            'linear2': _lin(sd, f'{pfx}.linear2'),
            'norm2': _ln(sd, f'{pfx}.norm2'),
            'norm3': _ln(sd, f'{pfx}.norm3'),
        }
        if f'{pfx}.self_attn.in_proj_weight' in sd:
            lp['self_attn'] = _mha(sd, f'{pfx}.self_attn')
            lp['norm1'] = _ln(sd, f'{pfx}.norm1')
        lls.append(lp)
    return {'proj': _lin(sd, f'{prefix}proj'),
            'layers': lls, 'cls': _lin(sd, f'{prefix}cls')}


def convert_abinet_alignment(sd, prefix='alignment.'):
    """Reference BaseAlignment (abinet/model_alignment.py:7-28) -> params."""
    return {'w_att': _lin(sd, f'{prefix}w_att'), 'cls': _lin(sd, f'{prefix}cls')}


def convert_abinet(sd):
    """Reference ABINet state_dict -> (params, stats) for models/abinet.py."""
    params, stats = {}, {}
    # vision
    vp, vs = {}, {}
    vp['resnet'], vs['resnet'] = _abinet_r45(sd, 'vision.backbone.resnet')
    n_tf = 1 + max((int(k.split('.')[4]) for k in sd
                    if k.startswith('vision.backbone.transformer.layers.')), default=-1)
    if n_tf > 0:
        vp['transformer'] = [_enc_layer_conv(sd, f'vision.backbone.transformer.layers.{i}')
                             for i in range(n_tf)]
    if 'vision.attention.project.weight' in sd:  # PositionAttention
        vp['attention'], vs['attention'] = convert_abinet_pos_attention(sd)
    else:  # sv Attention variant
        vp['attention'] = {
            'f0_embedding': {'w': jnp.asarray(_np(sd['vision.attention.f0_embedding.weight']))},
            'w0': _lin(sd, 'vision.attention.w0'),
            'wv': _lin(sd, 'vision.attention.wv'),
            'we': _lin(sd, 'vision.attention.we'),
        }
    vp['cls'] = _lin(sd, 'vision.cls')
    params['vision'], stats['vision'] = vp, vs

    params['language'] = convert_abinet_language(sd)
    params['alignment'] = convert_abinet_alignment(sd)
    return params, stats


def convert_vitstr(sd):
    """Reference ViTSTR (a timm ViT + head, flat keys) -> vitstr.init layout."""
    head = _lin(sd, 'head')
    enc = convert_vit_encoder({k: v for k, v in sd.items() if not k.startswith('head.')}, prefix='')
    return {'encoder': enc, 'head': head}


def convert_parseq(sd, dec_depth=None):
    """Reference PARSeq inner-model state_dict -> parseq.init param layout.

    Accepts either the released flat weights (keys like 'encoder.*') or a
    Lightning checkpoint's model-scoped keys ('model.encoder.*' — strip the
    prefix first with strip_prefix()).
    """
    if dec_depth is None:
        dec_depth = 1 + max(
            int(k.removeprefix('decoder.layers.').split('.')[0])
            for k in sd
            if k.startswith('decoder.layers.')
        )
    dec_layers = []
    for i in range(dec_depth):
        lp = f'decoder.layers.{i}'
        dec_layers.append({
            'self_attn': _mha(sd, f'{lp}.self_attn'),
            'cross_attn': _mha(sd, f'{lp}.cross_attn'),
            'linear1': _lin(sd, f'{lp}.linear1'),
            'linear2': _lin(sd, f'{lp}.linear2'),
            'norm1': _ln(sd, f'{lp}.norm1'),
            'norm2': _ln(sd, f'{lp}.norm2'),
            'norm_q': _ln(sd, f'{lp}.norm_q'),
            'norm_c': _ln(sd, f'{lp}.norm_c'),
        })
    return {
        'encoder': convert_vit_encoder(sd, 'encoder'),
        'decoder': {'layers': dec_layers, 'norm': _ln(sd, 'decoder.norm')},
        'head': _lin(sd, 'head'),
        'text_embed': {'w': jnp.asarray(_np(sd['text_embed.embedding.weight']))},
        'pos_queries': jnp.asarray(_np(sd['pos_queries'])),
    }


def strip_prefix(sd, prefix='model.'):
    return {k.removeprefix(prefix): v for k, v in sd.items() if k.startswith(prefix)}


def load_torch_state_dict(path):
    """Load a .pt/.ckpt file into a {name: numpy} dict (CPU, no grad)."""
    import torch

    obj = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(obj, dict) and 'state_dict' in obj:
        obj = obj['state_dict']
    return {k: _np(v) for k, v in obj.items()}
