"""Int8 serving-path quantization for the big encoder matmuls.

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPS), and the ViT encoder is the largest single slice of the PARSeq
inference budget (PERF.md component table). This module provides:

- ``quantize_linear(p)``: per-output-channel symmetric weight quantization
  of one ``layers.linear`` params dict -> {'w_q': int8, 'w_scale': f32, 'b'}.
- ``int8_linear(p, x)``: dynamic per-token symmetric activation
  quantization + int8 dot (``preferred_element_type=int32``) + f32 rescale.
- ``quantize_tree(params, paths)``: transform selected linear sub-dicts in
  a params tree; ``layers.linear`` dispatches on the presence of 'w_q', so
  every call site (vit blocks, heads, ...) works unchanged.

The reference has no quantized path (torch fp32/fp16 only —
/root/reference/strhub/models/*); this is TPU-native headroom. It is
opt-in: nothing quantizes unless the caller transforms the params, and the
accuracy bar vs bf16 is measured in experiments/int8_accuracy.py before any
default flips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear(p, *, axis=0):
    """Per-output-channel symmetric int8 weight quant of a linear params
    dict {'w': (in, out), 'b'?}. axis: the contraction (input) axis of w —
    scales are per output channel so the rescale folds into the output."""
    w = p['w'].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)  # (1, out)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {'w_q': w_q, 'w_scale': scale.reshape(-1)}
    if 'b' in p:
        out['b'] = p['b']
    return out


def int8_linear(p, x):
    """y = x @ dequant(w_q) + b with the matmul on the int8 MXU path.

    Activations use dynamic per-token symmetric quantization: one max-abs
    reduce per row. All rescales happen once on the (.., out) result.
    """
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    ax = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(ax / 127.0, 1e-12)             # (N, 1)
    x_q = jnp.clip(jnp.round(x2.astype(jnp.float32) / x_scale),
                   -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, p['w_q'], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                 # (N, out) int32
    y = acc.astype(jnp.float32) * x_scale * p['w_scale'][None, :]
    if 'b' in p:
        y = y + p['b'].astype(jnp.float32)
    return y.reshape(*orig_shape[:-1], -1).astype(x.dtype)


def is_quantized(p) -> bool:
    return isinstance(p, dict) and 'w_q' in p


def quantize_tree(params, paths):
    """Return a copy of ``params`` with the linear dicts at ``paths``
    (iterables of keys, e.g. ('blocks', 'mlp', 'fc1') with list indices
    allowed) quantized. Non-matching structure raises KeyError."""
    import copy

    params = copy.copy(params)

    def rec(node, path):
        if not path:
            return quantize_linear(node)
        k, rest = path[0], path[1:]
        node = copy.copy(node)
        node[k] = rec(node[k], rest)
        return node

    for path in paths:
        params = rec(params, tuple(path))
    return params


def quantize_bundle(bundle):
    """Opt-in int8 serving: return a copy of a registry ModelBundle with its
    ViT encoder matmuls quantized (parseq / vitstr — the families whose
    params tree carries a vit.init 'encoder'). Other families raise."""
    import dataclasses

    p = bundle.params
    wrapped = isinstance(p, dict) and 'params' in p and 'stats' in p
    tree = p['params'] if wrapped else p
    if not (isinstance(tree, dict) and isinstance(tree.get('encoder'), dict)
            and 'blocks' in tree['encoder']):
        raise ValueError(
            f'int8 serving currently supports ViT-backed models '
            f'(parseq/vitstr); {bundle.name!r} has no ViT encoder')
    tree = dict(tree, encoder=quantize_vit_encoder(tree['encoder']))
    new_params = dict(p, params=tree) if wrapped else tree
    out = dataclasses.replace(bundle, params=new_params)
    out._jitted = None
    return out


def quantize_vit_encoder(enc_params):
    """Quantize the per-block qkv/proj/fc1/fc2 matmuls of a vit.init tree.

    Block params are stacked leaves (scan over layers), so one
    quantize_linear vmapped over the leading layer axis handles all layers;
    LN / patch_embed / pos_embed stay high-precision.
    """
    import copy

    enc = copy.copy(enc_params)
    blocks = copy.copy(enc['blocks'])

    def q_stacked(p):
        # p['w']: (L, in, out) — per-layer, per-out-channel scales
        return jax.vmap(quantize_linear)(p)

    attn = copy.copy(blocks['attn'])
    for k in ('q', 'k', 'v', 'out'):
        attn[k] = q_stacked(attn[k])
    mlp = copy.copy(blocks['mlp'])
    for k in ('fc1', 'fc2'):
        mlp[k] = q_stacked(mlp[k])
    blocks['attn'] = attn
    blocks['mlp'] = mlp
    enc['blocks'] = blocks
    return enc
