#!/usr/bin/env python
"""ViTSTR stage decomposition (round 4, VERDICT item 2).

ViTSTR is the one family with no stage budget and the worst time-per-FLOP:
38.4 ms at batch 256 / 4.60 G-MACs vs PARSeq's 23.3 ms / 4.20 G. It is
architecturally just the shared ViT encoder (224x224, patch 16, N=196+1
tokens) + a linear head, so something about its SHAPE is hostile.

Hypotheses, each measured with the slope harness (experiments/_timing.py):
  H1 patchify: 224x224x3 inputs have the C=3 minor dim lane-padded 42x;
     the row-accumulation patchify was measured ~6.8 ms in round 2.
     Variants: current, XLA conv_general_dilated (stride==kernel),
     pre-reshaped (B,H,W*C) input, f32-vs-bf16 image input.
  H2 token count: N=197 is tiling-hostile (197 lanes pad to 256 in the
     attention NxN and the softmax). Encoder-only at N=196 / 197 / 256
     with identical D, depth.
  H3 head slice: x[:, 1:27] of (B, 197, 384) forcing a relayout.

Run: python experiments/vitstr_decomposition.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from experiments._timing import slope_ms
from parseq_tpu.models import vit, vitstr
from parseq_tpu.ops.layers import layer_norm, linear

B = 256


def main():
    cfg = vitstr.ViTSTRConfig()  # production: 224x224, patch 16, depth 12
    params = vitstr.init(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    img = jax.random.uniform(jax.random.key(1), (B, 224, 224, 3), jnp.float32)
    img_bf = img.astype(jnp.bfloat16)

    print(f'=== ViTSTR decomposition, batch {B}, bf16 compute ===')

    def t(label, body):
        ms = slope_ms(body, n1=4, n2=12, trials=3)
        print(f'{label:44s} {ms:8.2f} ms')
        return ms

    # --- full model ---------------------------------------------------------
    def full(i, k):
        x = jnp.roll(img, i, axis=0)
        logits = vitstr.forward(params, cfg, x, dtype=jnp.bfloat16)
        return jnp.sum(logits) * 1e-9

    full_ms = t('full forward (prod path, f32 input)', full)

    def full_bf(i, k):
        x = jnp.roll(img_bf, i, axis=0)
        logits = vitstr.forward(params, cfg, x, dtype=jnp.bfloat16)
        return jnp.sum(logits) * 1e-9

    t('full forward (bf16 input)', full_bf)

    # --- patchify variants ---------------------------------------------------
    vcfg = cfg.vit
    pe = params['encoder']['patch_embed']

    def patch_cur(i, k):
        x = jnp.roll(img_bf, i, axis=0)
        return jnp.sum(vit.patch_embed(pe, x, vcfg).astype(jnp.float32)) * 1e-9

    t('patchify current (row-accum matmul)', patch_cur)

    def patch_cur_f32in(i, k):
        x = jnp.roll(img, i, axis=0)
        return jnp.sum(vit.patch_embed(pe, x.astype(jnp.bfloat16), vcfg)
                       .astype(jnp.float32)) * 1e-9

    t('patchify current (f32 input + cast)', patch_cur_f32in)

    def patch_conv(i, k):
        x = jnp.roll(img_bf, i, axis=0)
        ph, pw = vcfg.patch_size
        w = pe['w'].astype(x.dtype).reshape(ph, pw, 3, vcfg.embed_dim)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(ph, pw), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = y + pe['b'].astype(y.dtype)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    t('patchify via conv_general_dilated', patch_conv)

    # input already in (B, H, W*C) row-major form: what does the relayout cost?
    img_flat = img_bf.reshape(B, 224, 224 * 3)

    def patch_preflat(i, k):
        x = jnp.roll(img_flat, i, axis=0)
        x = x.reshape(B, 224, 224, 3)
        return jnp.sum(vit.patch_embed(pe, x, vcfg).astype(jnp.float32)) * 1e-9

    t('patchify from preflat (B,H,W*C) input', patch_preflat)

    # --- encoder blocks at N = 196 / 197 / 256 -------------------------------
    for n_tok in (196, 197, 200, 208, 256):
        blocks = params['encoder']['blocks']
        x0 = jax.random.normal(jax.random.key(2), (B, n_tok, 384), jnp.bfloat16)

        def enc_only(i, k, x0=x0, blocks=blocks):
            x = x0 + (i * 1e-6)

            def body(x, bp):
                return vit.block_apply(bp, x, vcfg.num_heads), None

            x, _ = jax.lax.scan(body, x, blocks)
            return jnp.sum(x.astype(jnp.float32)) * 1e-9

        t(f'12 encoder blocks @ N={n_tok}', enc_only)

    # --- head ----------------------------------------------------------------
    x_tok = jax.random.normal(jax.random.key(3), (B, 197, 384), jnp.bfloat16)
    head = params['head']
    norm = params['encoder']['norm']

    def head_only(i, k):
        x = x_tok + (i * 1e-6)
        x = layer_norm(norm, x)
        y = linear(head, x[:, 1:27]).astype(jnp.float32)
        return jnp.sum(y) * 1e-9

    t('final LN + slice + head', head_only)

    # --- PARSeq encoder control (N=256, 32x128/4x8) ---------------------------
    pcfg = vit.ViTConfig()  # PARSeq encoder defaults
    pparams = vit.init(jax.random.key(4), pcfg)
    pimg = jax.random.uniform(jax.random.key(5), (B, 32, 128, 3), jnp.bfloat16)

    def parseq_enc(i, k):
        x = jnp.roll(pimg, i, axis=0)
        return jnp.sum(vit.apply(pparams, x, pcfg).astype(jnp.float32)) * 1e-9

    t('control: PARSeq encoder full (N=256)', parseq_enc)


if __name__ == '__main__':
    main()
