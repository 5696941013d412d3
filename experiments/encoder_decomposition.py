#!/usr/bin/env python
"""Where do the encoder's 18 ms go? Time ablated variants on the real chip.

Variants (12 layers, L=128, d=384, batch 256, bf16, macro-batched dispatch):
  full        : LN1 + attention + LN2 + MLP          (production scan path)
  no_attn     : LN1 + qkv/proj matmuls only (no softmax/score dots)
  no_mlp      : attention sublayer only
  matmuls_only: the 6 matmuls per layer, no LN/softmax/gelu/residual
  mlp_only    : LN2 + MLP sublayer only
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from parseq_tpu.models import vit
from parseq_tpu.ops import layers
from parseq_tpu.ops.layers import layer_norm, linear, mlp


def timed(fwd, make_stack, trials=5, n_disp=8):
    _ = float(fwd(make_stack(999)).sum())
    times = []
    for t in range(trials):
        stacks = [make_stack(1000 * t + i) for i in range(n_disp)]
        _ = float(jnp.stack([s.sum() for s in stacks]).sum())
        t0 = time.perf_counter()
        outs = [fwd(s) for s in stacks]
        _ = float(jnp.stack([o.sum() for o in outs]).sum())
        times.append((time.perf_counter() - t0) / n_disp)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--macro', type=int, default=4)
    args = ap.parse_args()

    cfg = vit.ViTConfig(img_size=(32, 128), patch_size=(4, 8), embed_dim=384,
                        depth=12, num_heads=6)
    params = vit.init(jax.random.key(0), cfg)
    L, D, B, M = cfg.num_patches, cfg.embed_dim, args.batch, args.macro

    def make_stack(seed):
        return jax.random.normal(jax.random.key(seed), (M, B, L, D), jnp.bfloat16)

    def block_full(p, x):
        return vit.block_apply(p, x, cfg.num_heads)

    def block_no_attn(p, x):
        h = layer_norm(p['norm1'], x)
        q = linear(p['attn']['q'], h)
        o = linear(p['attn']['out'], q + linear(p['attn']['k'], h) + linear(p['attn']['v'], h))
        x = x + o
        return x + mlp(p['mlp'], layer_norm(p['norm2'], x))

    def block_no_mlp(p, x):
        from parseq_tpu.ops.attention import encoder_self_attention
        return x + encoder_self_attention(p['attn'], layer_norm(p['norm1'], x),
                                          cfg.num_heads)

    def block_matmuls(p, x):
        q = linear(p['attn']['q'], x)
        k = linear(p['attn']['k'], x)
        v = linear(p['attn']['v'], x)
        o = linear(p['attn']['out'], q + k + v)
        h = linear(p['mlp']['fc1'], o)
        return linear(p['mlp']['fc2'], h)

    def block_mlp_only(p, x):
        return x + mlp(p['mlp'], layer_norm(p['norm2'], x))

    for name, block in [('full', block_full), ('no_attn', block_no_attn),
                        ('no_mlp', block_no_mlp), ('matmuls_only', block_matmuls),
                        ('mlp_only', block_mlp_only)]:
        def run(x, block=block):
            def body(x, bp):
                return block(bp, x), None
            return jax.lax.scan(body, x, params['blocks'])[0]

        fwd = jax.jit(lambda s, run=run: jax.lax.map(run, s))
        t = timed(fwd, make_stack) / M
        print(f'{name:13s}: {t * 1e3:7.2f} ms/batch')


if __name__ == '__main__':
    main()
