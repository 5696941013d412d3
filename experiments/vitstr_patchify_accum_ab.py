#!/usr/bin/env python
"""A/B: conv patchify f32 accumulation (advisor round-4 fix) vs bf16-out conv,
plus full ViTSTR forward, on the real chip (round 5).

The round-5 bench sweep read ViTSTR at 25.5 ms where round 4 recorded
21.9 ms. Two candidate explanations: session drift (round 4 itself saw
38.4 vs 31.4 ms across sessions for the same code) or the round-5 change
giving conv_general_dilated preferred_element_type=f32 (wider conv output
writes + a cast, in exchange for rounding-identical gate branches).
This measures the patchify stage and the full forward both ways.

Run: python experiments/vitstr_patchify_accum_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from experiments._timing import slope_ms
from parseq_tpu.models import vitstr


def t(label, body, **kw):
    ms = slope_ms(body, n1=4, n2=12, trials=3, **kw)
    print(f'{label:54s} {ms:8.2f} ms', flush=True)
    return ms


def main():
    cfg = vitstr.ViTSTRConfig()
    vcfg = cfg.vit
    params = vitstr.init(jax.random.key(0), cfg)
    B = 256
    img = jax.random.uniform(jax.random.key(1), (B, *cfg.img_size, 3), jnp.float32)
    img = ((img - 0.5) / 0.5).astype(jnp.bfloat16)
    pe = params['encoder']['patch_embed'] if 'encoder' in params else params['patch_embed']

    def patch_f32accum(i, k):
        x = img + i * 1e-6
        w = pe['w'].astype(x.dtype).reshape(*vcfg.patch_size, 3, vcfg.embed_dim)
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=vcfg.patch_size, padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        out = out.astype(x.dtype) + pe['b'].astype(x.dtype)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    def patch_bf16out(i, k):
        x = img + i * 1e-6
        w = pe['w'].astype(x.dtype).reshape(*vcfg.patch_size, 3, vcfg.embed_dim)
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=vcfg.patch_size, padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        out = out + pe['b'].astype(out.dtype)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    t('patchify conv, preferred_element_type=f32 (prod)', patch_f32accum)
    t('patchify conv, bf16 output (pre-round-5)', patch_bf16out)

    imgf = jax.random.uniform(jax.random.key(2), (B, *cfg.img_size, 3), jnp.float32)
    imgf = (imgf - 0.5) / 0.5

    def full(i, k):
        x = jnp.roll(imgf, i, axis=0)
        return jnp.sum(vitstr.forward(params, cfg, x, dtype=jnp.bfloat16)) * 1e-9

    ms = t('full ViTSTR forward (production)', full)
    print(f'  -> {B/ms*1000:,.0f} img/s', flush=True)


if __name__ == '__main__':
    main()
