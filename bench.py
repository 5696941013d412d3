#!/usr/bin/env python
"""Benchmark: PARSeq-S inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 5000 img/s/chip PARSeq-S inference at
reference accuracy settings (decode_ar=True, refine_iters=1, 94-charset).

Methodology notes (axon relay semantics): block_until_ready does not
synchronize remote execution and identical (executable, args) pairs can be
served from cache, so every timed call uses a never-before-seen device-
resident batch and execution is forced by fetching one fused scalar
reduction of all outputs to the host.
"""

import argparse
import json
import statistics
import time

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq

BASELINE_IMG_PER_S = 5000.0


def make_batches(seed, n, batch_size, img_size):
    keys = jax.random.split(jax.random.key(seed), n)
    batches = [jax.random.uniform(k, (batch_size, *img_size, 3), jnp.float32) for k in keys]
    # Force materialization so generation is not timed.
    _ = float(jnp.stack([b.sum() for b in batches]).sum())
    return batches


def wait_for_device(max_wait_s=5400, probe_timeout_s=90):
    """The axon relay has transient outages (device ops hang while its HTTP
    side stays up) — observed from minutes up to 4+ hours (round 3). Probe
    with a tiny matmul in a bounded subprocess and wait for recovery so a
    driver-run bench doesn't record a dead-relay failure as the round's
    number."""
    import subprocess
    import sys

    probe = ("import jax, jax.numpy as jnp; "
             "(jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready(); print('ok')")
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, '-c', probe],
                               capture_output=True, timeout=probe_timeout_s)
            if r.returncode == 0 and b'ok' in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            return False
        print(f'# device probe {attempt} failed; retrying...', flush=True)
        time.sleep(30)


def main():
    ap = argparse.ArgumentParser()
    # 384 is the measured throughput peak (round-5 sweep: 256 -> 12.6k,
    # 384 -> 13.1k, 448+ falls off as the AR decode working set outgrows
    # VMEM); see PERF.md "bench.py macro/batch sweep".
    ap.add_argument('--batch_size', type=int, default=384)
    ap.add_argument('--iters', type=int, default=32)
    ap.add_argument('--trials', type=int, default=3)
    ap.add_argument('--no_wait', action='store_true')
    args = ap.parse_args()

    if not args.no_wait and not wait_for_device():
        # proceed anyway as a last chance — exiting guarantees a failed
        # round number, attempting might still succeed if the relay just
        # recovered — but say so loudly first.
        print('# WARNING: device probe never succeeded; attempting bench anyway',
              flush=True)

    cfg = parseq.PARSeqConfig(num_tokens=97)  # test-default: AR + 1 refine iter
    params = parseq.init(jax.random.key(0), cfg)

    # Macro-batched serving pattern: one device program runs `macro` batches
    # per dispatch (lax.map), amortizing host->device dispatch latency.
    macro = 4

    @jax.jit
    def fwd(params, stack):  # (macro, B, H, W, C)
        # use_fused_ar: whole-loop pallas AR decoder — validated accuracy-
        # equivalent to the exact scan on trained weights (identical val
        # accuracy, 99.6% string agreement; PERF.md).
        return jax.lax.map(lambda im: parseq.forward(params, cfg, im, dtype=jnp.bfloat16,
                                                     use_fused_ar=True), stack)

    def make_stacks(seed, n):
        keys = jax.random.split(jax.random.key(seed), n)
        stacks = [jax.random.uniform(k, (macro, args.batch_size, *cfg.img_size, 3), jnp.float32)
                  for k in keys]
        _ = float(jnp.stack([s.sum() for s in stacks]).sum())
        return stacks

    n_disp = max(1, args.iters // macro)
    _ = float(fwd(params, make_stacks(999, 1)[0]).sum())  # compile + warmup

    times = []
    for t in range(args.trials):
        stacks = make_stacks(t, n_disp)
        t0 = time.perf_counter()
        outs = [fwd(params, s) for s in stacks]
        _ = float(jnp.stack([o.sum() for o in outs]).sum())  # forces execution
        times.append(time.perf_counter() - t0)
    args.iters = n_disp * macro

    img_per_s = args.batch_size * args.iters / statistics.median(times)
    print(json.dumps({
        'metric': 'parseq_s_infer_throughput',
        'value': round(img_per_s, 1),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 3),
    }))


if __name__ == '__main__':
    main()
