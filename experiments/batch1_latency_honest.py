#!/usr/bin/env python
"""Honest batch-1 inference device latency (slope-timed).

The early-round-2 "6.1 ms median" batch-1 figure and the later ~32 ms
median are both host-observed through the relay, whose RTT0 (~13-42 ms,
experiments/fetch_scaling.py) dominates and drifts. This slope-times the
batch-1 forward (AR + 1 refine, the reference latency protocol,
/root/reference/README.md:214-219) in an in-jit chain — pure device
compute per image, no dispatch/RTT terms. The relay-independent number a
direct-attached deployment would see (plus its own sub-ms dispatch).

Also reports batch-1 WITHOUT the fused AR kernel (exact scan path),
greedy NAR with refine_iters=0 (the latency floor), and NAR with
refine_iters=3 — the exact protocol behind the reference's 14.87 ms GPU
figure (README.md:214-219 runs bench.py with decode_ar=false
refine_iters=3).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import dataclasses

import jax
import jax.numpy as jnp

from _timing import slope_ms
from parseq_tpu.models import parseq


def main():
    cfg = parseq.PARSeqConfig(num_tokens=97)
    params = parseq.init(jax.random.key(0), cfg)
    im0 = jax.random.uniform(jax.random.key(7), (1, *cfg.img_size, 3), jnp.float32)

    def body_fused(i, key):
        im = im0 * (1.0 + 0.001 * i.astype(jnp.float32))
        logits = parseq.forward(params, cfg, im, dtype=jnp.bfloat16,
                                use_fused_ar=True)
        return jnp.sum(logits.astype(jnp.float32)) * 1e-6

    def body_scan(i, key):
        im = im0 * (1.0 + 0.001 * i.astype(jnp.float32))
        logits = parseq.forward(params, cfg, im, dtype=jnp.bfloat16,
                                use_fused_ar=False)
        return jnp.sum(logits.astype(jnp.float32)) * 1e-6

    nar_cfg = dataclasses.replace(cfg, decode_ar=False, refine_iters=0)
    nar3_cfg = dataclasses.replace(cfg, decode_ar=False, refine_iters=3)

    def body_nar(i, key):
        im = im0 * (1.0 + 0.001 * i.astype(jnp.float32))
        logits = parseq.forward(params, nar_cfg, im, dtype=jnp.bfloat16)
        return jnp.sum(logits.astype(jnp.float32)) * 1e-6

    def body_nar3(i, key):
        im = im0 * (1.0 + 0.001 * i.astype(jnp.float32))
        logits = parseq.forward(params, nar3_cfg, im, dtype=jnp.bfloat16)
        return jnp.sum(logits.astype(jnp.float32)) * 1e-6

    for name, body in [('AR+refine, fused kernel       ', body_fused),
                       ('AR+refine, exact scan         ', body_scan),
                       ('NAR refine=0 (floor)          ', body_nar),
                       ('NAR refine=3 (ref 14.87ms cfg)', body_nar3)]:
        t = slope_ms(body, n1=20, n2=80)
        print(f'batch-1 {name}: {t:6.2f} ms device', flush=True)


if __name__ == '__main__':
    main()
