#!/usr/bin/env python
"""ViTSTR follow-up (VERDICT r3 item 2): attention path + patchify A/B.

vitstr_decomposition.py found: 12 encoder blocks cost ~29 ms at EVERY
N in {196..256} while the PARSeq-shape control (N=128) runs 10.7 ms —
flat-in-N because the einsum path's materialized (B, 6, N, N) f32 scores
pad the minor (key) dim to 256 lanes, so N=197 pays N=256's HBM traffic:
~4 passes x 256*6*197*256-padded f32 ~= 0.9 GB/layer, ~11 GB across 12
layers. The pallas no-split kernel keeps scores in VMEM; it lost at
PARSeq's L=128 (20.4 vs 24.1 ms round 2) but the score traffic scales
~N^2 while its overhead doesn't, so re-measure at L=197.

Also: conv_general_dilated patchify measured ~0 ms vs 2.4 ms for the
row-accum matmul at 224x224/patch16 (the round-2 'dense patchify'
rejection was at PARSeq's 32x128/4x8 geometry). Re-check both geometries
to set the gate.

Run: python experiments/vitstr_attention_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from experiments._timing import slope_ms
from parseq_tpu.models import vit, vitstr
from parseq_tpu.ops import attention

B = 256


def t(label, body, **kw):
    ms = slope_ms(body, n1=4, n2=12, trials=3, **kw)
    print(f'{label:52s} {ms:8.2f} ms', flush=True)
    return ms


def main():
    cfg = vitstr.ViTSTRConfig()
    vcfg = cfg.vit
    params = vitstr.init(jax.random.key(0), cfg)
    img_bf = jax.random.uniform(jax.random.key(1), (B, 224, 224, 3), jnp.bfloat16)

    print(f'=== ViTSTR attention path A/B, batch {B}, bf16 ===')

    # single attention sublayer at L=197
    x197 = jax.random.normal(jax.random.key(2), (B, 197, 384), jnp.bfloat16)
    ap = jax.tree.map(lambda v: v[0], params['encoder']['blocks'])['attn']

    def attn_einsum(i, k):
        x = x197 + i * 1e-6
        y = attention.encoder_self_attention(ap, x, 6, use_kernel=False)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    def attn_kernel(i, k):
        x = x197 + i * 1e-6
        y = attention.encoder_self_attention(ap, x, 6, use_kernel=True)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    t('attn sublayer L=197 einsum (prod)', attn_einsum)
    t('attn sublayer L=197 pallas no-split', attn_kernel)

    # 12-block scan, both attention paths
    blocks = params['encoder']['blocks']

    def enc(i, k, use_kernel):
        x = x197 + i * 1e-6

        def body(x, bp):
            from parseq_tpu.ops.layers import layer_norm, mlp
            h = layer_norm(bp['norm1'], x)
            x = x + attention.encoder_self_attention(bp['attn'], h, 6,
                                                     use_kernel=use_kernel)
            x = x + mlp(bp['mlp'], layer_norm(bp['norm2'], x))
            return x, None

        x, _ = jax.lax.scan(body, x, blocks)
        return jnp.sum(x.astype(jnp.float32)) * 1e-9

    t('12 blocks L=197 einsum', lambda i, k: enc(i, k, False))
    t('12 blocks L=197 pallas no-split', lambda i, k: enc(i, k, True))

    # patchify gate check at PARSeq geometry (round-2 rejection revisit)
    pcfg = vit.ViTConfig()
    pe = vit.init(jax.random.key(3), pcfg)['patch_embed']
    pimg = jax.random.uniform(jax.random.key(4), (B, 32, 128, 3), jnp.bfloat16)

    def p_cur(i, k):
        x = jnp.roll(pimg, i, axis=0)
        return jnp.sum(vit.patch_embed(pe, x, pcfg).astype(jnp.float32)) * 1e-9

    def p_conv(i, k):
        x = jnp.roll(pimg, i, axis=0)
        ph, pw = pcfg.patch_size
        w = pe['w'].astype(x.dtype).reshape(ph, pw, 3, pcfg.embed_dim)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(ph, pw), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.sum((y + pe['b'].astype(y.dtype)).astype(jnp.float32)) * 1e-9

    t('patchify 32x128/4x8 row-accum (prod)', p_cur)
    t('patchify 32x128/4x8 conv', p_conv)

    # full ViTSTR forward through the production path (after adoption this
    # takes conv patchify via the patch_dim gate and kernel attention via
    # the KERNEL_MIN_LEN gate; before, force with USE_KERNEL)
    def full_new(i, k):
        x = jnp.roll(img_bf, i, axis=0)
        logits = vitstr.forward(params, cfg, x, dtype=jnp.bfloat16)
        return jnp.sum(logits) * 1e-9

    ms = t('full ViTSTR fwd (production path)', full_new)
    print(f'  -> {B / ms * 1000:,.0f} img/s')


if __name__ == '__main__':
    main()
