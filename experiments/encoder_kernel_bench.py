#!/usr/bin/env python
"""Encoder microbench: scan-path ViT blocks vs the Pallas mega-kernel.

PARSeq-S geometry (12 layers, L=128 tokens, d=384, 6 heads), batch 256,
bf16, on the real chip. Methodology per bench.py: macro-batched dispatch,
never-reused inputs, execution forced by fetching a fused scalar.

Usage: python experiments/encoder_kernel_bench.py [--batch 256] [--macro 4]
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
from parseq_tpu.ops.encoder_kernel import fused_encoder_blocks, stack_block_params


def timed(fwd, make_stack, trials=5, n_disp=8):
    _ = float(fwd(make_stack(999)).sum())  # compile + warmup
    times = []
    for t in range(trials):
        stacks = [make_stack(1000 * t + i) for i in range(n_disp)]
        _ = float(jnp.stack([s.sum() for s in stacks]).sum())  # materialize
        t0 = time.perf_counter()
        outs = [fwd(s) for s in stacks]
        _ = float(jnp.stack([o.sum() for o in outs]).sum())
        times.append((time.perf_counter() - t0) / n_disp)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--macro', type=int, default=4)
    ap.add_argument('--depth', type=int, default=12)
    args = ap.parse_args()

    cfg = vit.ViTConfig(img_size=(32, 128), patch_size=(4, 8), embed_dim=384,
                        depth=args.depth, num_heads=6)
    params = vit.init(jax.random.key(0), cfg)
    L, D = cfg.num_patches, cfg.embed_dim
    B, M = args.batch, args.macro

    def make_stack(seed):
        return jax.random.normal(jax.random.key(seed), (M, B, L, D), jnp.bfloat16)

    def scan_blocks(x):
        def body(x, bp):
            return vit.block_apply(bp, x, cfg.num_heads), None
        y, _ = jax.lax.scan(body, x, params['blocks'])
        return y

    flops = 2 * B * L * D * (4 * D + 2 * L + 8 * D) * cfg.depth  # mul+add
    results = {}

    scan_fwd = jax.jit(lambda s: jax.lax.map(scan_blocks, s))
    t = timed(scan_fwd, make_stack) / M
    results['scan'] = t
    print(f'scan path:      {t * 1e3:7.2f} ms/batch  '
          f'{flops / t / 1e12:6.1f} TF/s  {B / t:8.0f} img/s')

    op = stack_block_params(params['blocks'])
    for bb, vmem in ((4, None), (8, None), (8, 100), (16, 100), (32, 100), (64, 120)):
        if B % bb:
            continue
        try:
            fused = jax.jit(lambda s, bb=bb, vmem=vmem: jax.lax.map(
                lambda x: fused_encoder_blocks(op, x, num_heads=cfg.num_heads,
                                               block_b=bb, vmem_limit_mb=vmem), s))
            t = timed(fused, make_stack) / M
            results[f'fused_bb{bb}_v{vmem}'] = t
            print(f'fused block_b={bb:2d} vmem={vmem}: {t * 1e3:7.2f} ms/batch  '
                  f'{flops / t / 1e12:6.1f} TF/s  {B / t:8.0f} img/s')
        except Exception as e:  # noqa: BLE001 - report VMEM overflows etc.
            print(f'fused block_b={bb:2d} vmem={vmem}: FAILED {type(e).__name__}: {str(e)[:160]}')

    best = min(results, key=results.get)
    print(f'best: {best} ({results[best] * 1e3:.2f} ms vs scan {results["scan"] * 1e3:.2f} ms, '
          f'{results["scan"] / results[best]:.2f}x)')


if __name__ == '__main__':
    main()
