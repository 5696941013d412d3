#!/usr/bin/env python
"""Macro-batch split: one big encoder batch + lax.map'd decode.

bench.py runs the WHOLE forward (encode + AR + refine) per lax.map lane
at bs=384 — the batch size the round-5 sweep found is the decode stack's
VMEM ceiling. But the encoder has no such ceiling (pure feed-forward,
no 26-step live working set), so lax.map forces it to run at 384 when it
could run once over all macro*384 images: potentially better late-stage
MXU tiling and no loop-iteration boundary between encoder and decode.

This A/Bs bench.py's fused forward against a split version:
  memory = encode(reshape(stack, (macro*B, H, W, C)))
  logits = lax.map(decode_only, reshape(memory, (macro, B, L, D)))

using bench.py's exact timing methodology (fresh device-resident stacks,
fused scalar fetch).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq
from parseq_tpu.ops.ar_kernel import ar_decode_fused

MACRO = 4


def timeit(fwd, params, batch_size, cfg, trials=3, iters=20):
    def make_stacks(seed, n):
        keys = jax.random.split(jax.random.key(seed), n)
        stacks = [jax.random.uniform(k, (MACRO, batch_size, *cfg.img_size, 3),
                                     jnp.float32) for k in keys]
        _ = float(jnp.stack([s.sum() for s in stacks]).sum())
        return stacks

    n_disp = max(1, iters // MACRO)
    _ = float(fwd(params, make_stacks(999, 1)[0]).sum())  # compile + warmup
    times = []
    for t in range(trials):
        stacks = make_stacks(t, n_disp)
        t0 = time.perf_counter()
        outs = [fwd(params, s) for s in stacks]
        _ = float(jnp.stack([o.sum() for o in outs]).sum())
        times.append(time.perf_counter() - t0)
    return batch_size * n_disp * MACRO / statistics.median(times)


def main():
    cfg = parseq.PARSeqConfig(num_tokens=97)
    params = parseq.init(jax.random.key(0), cfg)

    @jax.jit
    def fused(params, stack):  # bench.py as-is
        return jax.lax.map(
            lambda im: parseq.forward(params, cfg, im, dtype=jnp.bfloat16,
                                      use_fused_ar=True), stack)

    @jax.jit
    def split(params, stack):  # one encoder batch, mapped decode
        m, b, h, w, c = stack.shape
        images = stack.reshape(m * b, h, w, c).astype(jnp.bfloat16)
        memory = parseq.encode(params, cfg, images).astype(jnp.bfloat16)
        memory = memory.reshape(m, b, *memory.shape[1:])

        def decode_only(mem):
            logits = ar_decode_fused(params, cfg, mem)
            logits = parseq.refine(params, cfg, mem, logits, jnp.bfloat16)
            return logits.astype(jnp.float32)

        return jax.lax.map(decode_only, memory)

    for bs in (384,):
        a = timeit(fused, params, bs, cfg)
        b = timeit(split, params, bs, cfg)
        print(f'bs={bs}: fused-per-lane {a:8.1f} img/s | split-encoder {b:8.1f} img/s '
              f'({(b / a - 1) * 100:+.1f}%)')


if __name__ == '__main__':
    main()
