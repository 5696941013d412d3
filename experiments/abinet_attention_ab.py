#!/usr/bin/env python
"""ABINet attention-kernel A/B on the real chip (round-5, VERDICT item 4).

Round 4 identified the mechanism behind the L>=192 einsum penalty — the
materialized (B, h, L, L) f32 scores pad the minor (key) dim to 256 lanes —
and gated the pallas no-split kernel into encoder_self_attention, but only
ViT called it. ABINet's vision transformer (3 layers, d=512, 8 heads,
L = 256 tokens) ran through plain layers.mha: the exact regime where the
kernel won 1.54 -> 0.85 ms/sublayer for ViTSTR, on the slowest family.

Measures (batch 256, bf16, slope-timed):
  - one vision-encoder sublayer: einsum vs kernel
  - 3-layer vision transformer stack: einsum vs kernel
  - full ABINet inference: production gate vs forced-einsum
and asserts on-device logits parity between the two full-forward paths.

Run: python experiments/abinet_attention_ab.py [--batch 256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from experiments._timing import slope_ms
from parseq_tpu.models import abinet
from parseq_tpu.ops import attention


def t(label, body, **kw):
    ms = slope_ms(body, n1=4, n2=12, trials=3, **kw)
    print(f'{label:52s} {ms:8.2f} ms', flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    args = ap.parse_args()
    B = args.batch

    cfg = abinet.ABINetConfig()
    params, stats = abinet.init(jax.random.key(0), cfg)
    lp = params['vision']['transformer'][0]
    H, W = cfg.feat_hw
    L, E = H * W, cfg.d_model

    print(f'=== ABINet attention A/B, batch {B}, L={L}, d={E}, '
          f'{cfg.nhead} heads, bf16 ===', flush=True)

    x0 = jax.random.normal(jax.random.key(2), (B, L, E), jnp.bfloat16)

    def sub_einsum(i, k):
        x = x0 + i * 1e-6
        y = attention.encoder_self_attention(lp['self_attn'], x, cfg.nhead,
                                             use_kernel=False)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    def sub_kernel(i, k):
        x = x0 + i * 1e-6
        y = attention.encoder_self_attention(lp['self_attn'], x, cfg.nhead,
                                             use_kernel=True)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    t('attn sublayer L=256 d=512 einsum', sub_einsum)
    t('attn sublayer L=256 d=512 pallas no-split', sub_kernel)

    def stack(i, k, use_kernel):
        x = x0 + i * 1e-6
        old = attention.KERNEL_MIN_LEN
        attention.KERNEL_MIN_LEN = (0 if use_kernel else 10 ** 9)
        try:
            for layer in params['vision']['transformer']:
                x = abinet._enc_layer(layer, cfg, x)
        finally:
            attention.KERNEL_MIN_LEN = old
        return jnp.sum(x.astype(jnp.float32)) * 1e-9

    t('3-layer vision transformer einsum', lambda i, k: stack(i, k, False))
    t('3-layer vision transformer kernel', lambda i, k: stack(i, k, True))

    # full inference, production gate vs forced einsum
    img0 = jax.random.uniform(jax.random.key(3), (B, *cfg.img_size, 3), jnp.float32)
    img0 = (img0 - 0.5) / 0.5

    def full(i, k):
        x = jnp.roll(img0, i, axis=0)
        logits = abinet.inference_logits(params, stats, cfg, x, dtype=jnp.bfloat16)
        return jnp.sum(logits) * 1e-9

    ms_prod = t('full ABINet (production gate)', full)
    with attention.force_einsum():
        ms_ein = t('full ABINet (forced einsum)', full)
    print(f'  -> production {B/ms_prod*1000:,.0f} img/s vs einsum '
          f'{B/ms_ein*1000:,.0f} img/s', flush=True)

    # on-device parity between the two paths
    fwd = lambda x: abinet.inference_logits(params, stats, cfg, x, dtype=jnp.bfloat16)
    prod = np.asarray(jax.jit(fwd)(img0[:64]), np.float32)
    with attention.force_einsum():
        ein = np.asarray(jax.jit(fwd)(img0[:64]), np.float32)
    d = float(np.max(np.abs(prod - ein)))
    top2 = np.sort(ein, -1)[..., -2:]
    confident = (top2[..., 1] - top2[..., 0]) > 0.1
    agree = float((prod.argmax(-1) == ein.argmax(-1))[confident].mean())
    print(f'on-device parity: max|logit diff| {d:.3e}, greedy agreement '
          f'(>0.1 margin) {agree:.6f}', flush=True)
    assert d < 0.25 and agree == 1.0, 'kernel-path parity violated'
    print('parity OK')


if __name__ == '__main__':
    main()
