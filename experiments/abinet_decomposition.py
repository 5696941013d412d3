#!/usr/bin/env python
"""ABINet stage timings on the real chip (batch 256, bf16).

Stages: resnet45 -> 3-layer transformer (256 tokens, d=512) ->
position attention (mini U-Net) -> 3x (BCN LM + alignment) iterations.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from parseq_tpu.models import abinet


def timed(fwd, make_stack, trials=5, n_disp=6):
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
    ap.add_argument('--macro', type=int, default=2)
    args = ap.parse_args()
    B, M = args.batch, args.macro

    cfg = abinet.ABINetConfig()
    params, stats = abinet.init(jax.random.key(0), cfg)

    def make_stack(seed):
        return jax.random.uniform(jax.random.key(seed),
                                  (M, B, *cfg.img_size, 3), jnp.float32)

    vp, vs = params['vision'], stats['vision']

    def s_resnet(x):
        return abinet.resnet45(vp['resnet'], vs['resnet'],
                               x.astype(jnp.bfloat16), train=False)[0]

    def s_transformer(x):
        y = s_resnet(x)
        Bx, H, W, E = y.shape
        seq = y.reshape(Bx, H * W, E) + abinet.sinusoid_pe(H * W, E)[None].astype(y.dtype)
        for lp in vp['transformer']:
            seq = abinet._enc_layer(lp, cfg, seq)
        return seq

    def s_vision(x):
        return abinet.vision_forward(vp, vs, cfg, x.astype(jnp.bfloat16),
                                     train=False)[0]['logits']

    def s_full(x):
        return abinet.inference_logits(params, stats, cfg, x, dtype=jnp.bfloat16)

    for name, fn in [('resnet45', s_resnet), ('+transformer', s_transformer),
                     ('vision (+pos attn)', s_vision),
                     ('full (+3x LM/align)', s_full)]:
        fwd = jax.jit(lambda s, fn=fn: jax.lax.map(fn, s))
        t = timed(fwd, make_stack) / M
        print(f'{name:20s}: {t * 1e3:7.2f} ms/batch ({B / t:7.0f} img/s)')


if __name__ == '__main__':
    main()
