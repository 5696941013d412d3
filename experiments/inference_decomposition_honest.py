#!/usr/bin/env python
"""Slope-timed inference component budget at the bench batch size.

README/PERF cite "encoder 11.7 + AR 3.9 + refine 1.3 ≈ 17 ms device" per
256-batch from round-2 per-call measurements. After the round-3 timing
correction (relay_timing_calibration.py) every sub-10 ms component number
needs re-deriving with experiments/_timing.slope_ms. Pieces at bs=256,
bf16, reference accuracy settings (AR + 1 refine):

  full forward (fused AR)   — should reproduce bench.py's ~20.5 ms/batch
  full forward (exact scan) — the fused-kernel margin
  encoder only
  fused AR only   (memory precomputed)
  exact-scan AR only
  refine only     (memory + logits precomputed)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from _timing import slope_ms
from parseq_tpu.models import parseq
from parseq_tpu.ops.ar_kernel import ar_decode_fused


def main():
    cfg = parseq.PARSeqConfig(num_tokens=97)
    params = parseq.init(jax.random.key(0), cfg)
    bs = 256
    im0 = jax.random.uniform(jax.random.key(7), (bs, *cfg.img_size, 3), jnp.float32)
    mem0 = parseq.encode(params, cfg, im0.astype(jnp.bfloat16))
    lg0 = parseq.nar_decode(params, cfg, mem0, jnp.bfloat16)

    def vary_im(i):
        return im0 * (1.0 + 0.001 * i.astype(jnp.float32))

    def vary_mem(i):
        return mem0 * (1.0 + 0.001 * i.astype(mem0.dtype))

    cases = [
        ('full fwd, fused AR ', lambda i, k: jnp.sum(parseq.forward(
            params, cfg, vary_im(i), dtype=jnp.bfloat16, use_fused_ar=True)) * 1e-6),
        ('full fwd, exact scan', lambda i, k: jnp.sum(parseq.forward(
            params, cfg, vary_im(i), dtype=jnp.bfloat16, use_fused_ar=False)) * 1e-6),
        ('encoder only        ', lambda i, k: jnp.sum(parseq.encode(
            params, cfg, vary_im(i).astype(jnp.bfloat16)).astype(jnp.float32)) * 1e-6),
        ('fused AR only       ', lambda i, k: jnp.sum(ar_decode_fused(
            params, cfg, vary_mem(i)).astype(jnp.float32)) * 1e-6),
        ('exact-scan AR only  ', lambda i, k: jnp.sum(parseq.ar_decode(
            params, cfg, vary_mem(i), jnp.bfloat16).astype(jnp.float32)) * 1e-6),
        ('refine only         ', lambda i, k: jnp.sum(parseq.refine(
            params, cfg, vary_mem(i), lg0, jnp.bfloat16).astype(jnp.float32)) * 1e-6),
    ]
    for name, body in cases:
        t = slope_ms(body, n1=8, n2=32)
        print(f'{name}: {t:6.2f} ms/256-batch ({bs/t*1000:,.0f} img/s)', flush=True)


if __name__ == '__main__':
    main()
