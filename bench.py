#!/usr/bin/env python
"""Benchmark: PARSeq-S inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 5000 img/s/chip PARSeq-S inference at
reference accuracy settings (decode_ar=True, refine_iters=1, 94-charset).
"""

import json
import time

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq

BASELINE_IMG_PER_S = 5000.0


def main(batch_size=256, iters=20, warmup=3):
    cfg = parseq.PARSeqConfig(num_tokens=97)  # test-default: AR + 1 refine iter
    params = parseq.init(jax.random.key(0), cfg)

    @jax.jit
    def fwd(params, images):
        return parseq.forward(params, cfg, images, dtype=jnp.bfloat16)

    images = jax.random.uniform(jax.random.key(1), (batch_size, *cfg.img_size, 3), jnp.float32)

    for _ in range(warmup):
        fwd(params, images).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, images)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    img_per_s = batch_size * iters / dt
    print(json.dumps({
        'metric': 'parseq_s_infer_throughput',
        'value': round(img_per_s, 1),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 3),
    }))


if __name__ == '__main__':
    main()
