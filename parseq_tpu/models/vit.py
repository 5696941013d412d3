"""Vision Transformer encoder, TPU-first.

Re-designs the reference encoder (timm VisionTransformer subclass with no
class token / no pooling, /root/reference/strhub/models/parseq/modules.py:128-165)
as pure functions:

  * Patch embedding is a single reshaped matmul (a stride==kernel Conv2d is
    exactly a matmul over flattened patches) — maps straight onto the MXU
    instead of going through a conv lowering.
  * Transformer blocks are parameter-stacked and traversed with `lax.scan`,
    which keeps compile time flat in depth and produces one fused block body.
  * Images are NHWC (TPU-native layout); the torch converter transposes.

Matches timm ViT forward_features semantics: patch_embed -> +pos_embed ->
blocks (pre-LN: x += attn(ln(x)); x += mlp(ln(x))) -> final LayerNorm.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from parseq_tpu.ops import layers
from parseq_tpu.ops.layers import layer_norm, linear, mha, mlp


@dataclass(frozen=True)
class ViTConfig:
    img_size: tuple[int, int] = (32, 128)  # (H, W)
    patch_size: tuple[int, int] = (4, 8)  # (ph, pw)
    in_chans: int = 3
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    class_token: bool = False  # PARSeq encoder: False; ViTSTR: True
    remat: bool = False  # rematerialize block activations (training memory)

    @property
    def grid_size(self) -> tuple[int, int]:
        return (self.img_size[0] // self.patch_size[0], self.img_size[1] // self.patch_size[1])

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw

    @property
    def num_tokens(self) -> int:
        return self.num_patches + int(self.class_token)


def _block_init(key, cfg: ViTConfig):
    d = cfg.embed_dim
    ks = layers.split_rngs(key, ['qkv', 'proj', 'mlp'])
    # timm Attention packs qkv in one linear; we keep separate q/k/v (split on
    # conversion). timm init: qkv/proj/mlp all trunc_normal(0.02) via init_weights_vit_timm.
    def tn(k, shape):
        return layers.trunc_normal(k, shape, 0.02)

    kq, kk, kv = jax.random.split(ks['qkv'], 3)
    return {
        'norm1': layers.layer_norm_init(d),
        'attn': {
            'q': {'w': tn(kq, (d, d)), 'b': jnp.zeros((d,))},
            'k': {'w': tn(kk, (d, d)), 'b': jnp.zeros((d,))},
            'v': {'w': tn(kv, (d, d)), 'b': jnp.zeros((d,))},
            'out': {'w': tn(ks['proj'], (d, d)), 'b': jnp.zeros((d,))},
        },
        'norm2': layers.layer_norm_init(d),
        'mlp': layers.mlp_init(ks['mlp'], d, int(d * cfg.mlp_ratio)),
    }


def init(key, cfg: ViTConfig):
    ks = layers.split_rngs(key, ['patch', 'pos', 'blocks'])
    ph, pw = cfg.patch_size
    patch_dim = ph * pw * cfg.in_chans
    block_keys = jax.random.split(ks['blocks'], cfg.depth)
    # Stack per-layer params along a leading depth axis for lax.scan.
    blocks = jax.vmap(lambda k: _block_init(k, cfg))(block_keys)
    params = {
        'patch_embed': {
            # timm PatchEmbed conv: kaiming-ish default; trunc_normal is fine
            # for from-scratch training (converted weights overwrite it anyway).
            'w': layers.trunc_normal(ks['patch'], (patch_dim, cfg.embed_dim), 0.02),
            'b': jnp.zeros((cfg.embed_dim,)),
        },
        'pos_embed': layers.trunc_normal(ks['pos'], (1, cfg.num_tokens, cfg.embed_dim), 0.02),
        'blocks': blocks,
        'norm': layers.layer_norm_init(cfg.embed_dim),
    }
    if cfg.class_token:
        # timm init: normal(std=1e-6)
        params['cls_token'] = 1e-6 * jax.random.normal(ks['pos'], (1, 1, cfg.embed_dim))
    return params


def patch_embed(p, images, cfg: ViTConfig):
    """images: (B, H, W, C) -> tokens (B, N, D), transpose-free.

    Patch pixels are flattened in (ph, pw, C) order; the torch converter
    permutes Conv2d weight (D, C, ph, pw) -> (ph, pw, C, D) to match.

    The naive 6-D patchify transpose is lowered by XLA to 2-3 full-size
    strided relayout copies (~7 ms/batch at 224x224, B=256 on v5e, with the
    C=3 minor dim lane-padded 42x). Instead: slice one patch-row at a time
    from the contiguous (B, gh, ph, gw, pw*C) view and accumulate ph
    matmuls — every element read once, straight into the MXU, no
    materialized intermediate. (A single block-diagonal dense matmul over
    the (B, gh, ph*W*C) row-group view was also measured and is slower —
    7.9 vs 6.8 ms at 224x224 — because the (ph*W*C, gw*D) weight expansion
    is rebuilt per call.)

    For LARGE patches (ViTSTR's 16x16: patch_dim = 768), XLA's own
    stride==kernel conv lowering beats the row-accumulation: ~0 vs 2.4 ms
    at 224x224 B=256 (experiments/vitstr_decomposition.py — the conv
    overlaps fully with adjacent work). At PARSeq's 4x8 geometry
    (patch_dim 96) the two are equal within noise, so the conv path is
    gated on patch_dim to leave the proven small-patch path untouched.
    """
    B, H, W, C = images.shape
    ph, pw = cfg.patch_size
    gh, gw = H // ph, W // pw
    D = cfg.embed_dim
    k = pw * C

    if ph * k >= 192:  # large patches: conv lowering wins (see docstring)
        w = p['w'].astype(images.dtype).reshape(ph, pw, C, D)
        # f32 accumulation + cast-then-bias mirrors the row path exactly so
        # both gate branches round identically in bf16.
        out = jax.lax.conv_general_dilated(
            images, w, window_strides=(ph, pw), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        out = out.astype(images.dtype) + p['b'].astype(images.dtype)
        return out.reshape(B, gh * gw, D)

    x = images.reshape(B, gh, ph, gw, k)                   # pure reshape
    w = p['w'].astype(images.dtype).reshape(ph, k, D)
    out = jnp.zeros((B, gh, gw, D), jnp.float32)
    for r in range(ph):
        out = out + jnp.einsum('bgwk,kd->bgwd', x[:, :, r], w[r],
                               preferred_element_type=jnp.float32)
    out = out.astype(images.dtype) + p['b'].astype(images.dtype)
    return out.reshape(B, gh * gw, D)


def block_apply(p, x, num_heads):
    from parseq_tpu.ops.attention import encoder_self_attention

    h = layer_norm(p['norm1'], x)
    x = x + encoder_self_attention(p['attn'], h, num_heads)
    x = x + mlp(p['mlp'], layer_norm(p['norm2'], x))
    return x


def apply(params, images, cfg: ViTConfig):
    """images (B, H, W, C) -> tokens (B, N[+1], D), final-LN applied.

    With class_token=True, the cls token is prepended before adding the
    positional table (timm default: pos_embed covers cls + patches)."""
    x = patch_embed(params['patch_embed'], images, cfg)
    if cfg.class_token:
        cls = jnp.broadcast_to(params['cls_token'].astype(x.dtype), (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params['pos_embed'].astype(x.dtype)

    def body(x, block_params):
        return block_apply(block_params, x, cfg.num_heads), None

    if cfg.remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params['blocks'])
    return layer_norm(params['norm'], x)
