#!/usr/bin/env python
"""Sweep the bench macro-batch factor (batches per device dispatch).

bench.py amortizes host->device dispatch latency by running `macro`
batches per jitted call via lax.map (the serving macro-batch pattern).
PERF.md round-4 put the amortized relay overhead at ~3.5 ms/batch at
macro=4; this sweep measures whether macro=8/16 recovers the remainder,
using bench.py's exact methodology (fresh device-resident stacks per
timed call, execution forced by a fused scalar fetch).

Args are `macro` or `macro:batch_size` (default batch 256), e.g.
`python experiments/bench_macro_sweep.py 4 8 16 4:384 4:512 2:768`.

Measured (round 5, real chip): macro 4/8/16 at bs=256 are within noise
(12,610-12,630 img/s) — dispatch amortization saturates at macro=4.
Batch sweep at macro=4: bs=384 -> 12,991 img/s (+3% over 256), bs=512 ->
11,397, bs=768 -> 10,367 (VMEM pressure past ~384x128x32 activations).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq


def run(macro, batch_size=256, iters=None, trials=3):
    if iters is None:  # hold total images/trial ~constant across batch sizes
        iters = max(macro, (32 * 256 // batch_size) // macro * macro)
    cfg = parseq.PARSeqConfig(num_tokens=97)
    params = parseq.init(jax.random.key(0), cfg)

    @jax.jit
    def fwd(params, stack):
        return jax.lax.map(lambda im: parseq.forward(params, cfg, im, dtype=jnp.bfloat16,
                                                     use_fused_ar=True), stack)

    def make_stacks(seed, n):
        keys = jax.random.split(jax.random.key(seed), n)
        stacks = [jax.random.uniform(k, (macro, batch_size, *cfg.img_size, 3), jnp.float32)
                  for k in keys]
        _ = float(jnp.stack([s.sum() for s in stacks]).sum())
        return stacks

    n_disp = max(1, iters // macro)
    _ = float(fwd(params, make_stacks(999, 1)[0]).sum())

    times = []
    for t in range(trials):
        stacks = make_stacks(t, n_disp)
        t0 = time.perf_counter()
        outs = [fwd(params, s) for s in stacks]
        _ = float(jnp.stack([o.sum() for o in outs]).sum())
        times.append(time.perf_counter() - t0)
    total = n_disp * macro
    med = statistics.median(times)
    print(f'macro={macro:3d} bs={batch_size} dispatches={n_disp} '
          f'median={med*1000:8.1f} ms for {total} batches '
          f'-> {batch_size*total/med:9.1f} img/s', flush=True)


if __name__ == '__main__':
    for spec in (sys.argv[1:] or ['4', '8', '16']):
        macro, _, bs = spec.partition(':')
        run(int(macro), batch_size=int(bs) if bs else 256)
