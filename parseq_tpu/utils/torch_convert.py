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
    """timm VisionTransformer (class_token=False, global_pool='') -> vit.init layout."""
    if depth is None:
        depth = 1 + max(
            int(k.removeprefix(f'{prefix}.blocks.').split('.')[0])
            for k in sd
            if k.startswith(f'{prefix}.blocks.')
        )
    conv_w = _np(sd[f'{prefix}.patch_embed.proj.weight'])  # (D, C, ph, pw)
    # Flatten in (ph, pw, C) order to match vit.patch_embed's patch layout.
    D = conv_w.shape[0]
    w = conv_w.transpose(2, 3, 1, 0).reshape(-1, D)
    blocks = []
    for i in range(depth):
        bp = f'{prefix}.blocks.{i}'
        blocks.append({
            'norm1': _ln(sd, f'{bp}.norm1'),
            'attn': _timm_attn(sd, f'{bp}.attn'),
            'norm2': _ln(sd, f'{bp}.norm2'),
            'mlp': {'fc1': _lin(sd, f'{bp}.mlp.fc1'), 'fc2': _lin(sd, f'{bp}.mlp.fc2')},
        })
    return {
        'patch_embed': {'w': jnp.asarray(w), 'b': jnp.asarray(_np(sd[f'{prefix}.patch_embed.proj.bias']))},
        'pos_embed': jnp.asarray(_np(sd[f'{prefix}.pos_embed'])),
        'blocks': _stack(blocks),
        'norm': _ln(sd, f'{prefix}.norm'),
    }


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
