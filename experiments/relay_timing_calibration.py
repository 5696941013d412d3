#!/usr/bin/env python
"""Calibrate timing methodologies against a known-FLOP workload.

bench.py's docstring already records that under the axon relay
block_until_ready does NOT synchronize remote execution; this experiment
quantifies how far off each timing pattern is, using a matmul chain whose
FLOP count is exact, so PERF.md numbers can state which methodology they
used and why it is trusted.

Patterns measured, each on a chain of N (4096x4096)@(4096x4096) bf16
matmuls (2*4096^3 = 137.4 GFLOP each):
  A. per-call dispatch, block_until_ready on last output only
  B. per-call dispatch, float() fetch of a scalar reduction at the end
  C. in-jit lax.scan of the chain, block_until_ready
  D. in-jit lax.scan, float() fetch
  E. in-jit scan SLOPE: (t(N2) - t(N1)) / (N2 - N1) — cancels dispatch,
     RTT, and fetch constants entirely
Implied TFLOP/s per pattern is printed; anything above the chip's peak is
a lie. E is the methodology adopted for all sub-10ms op measurements.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

M = 4096
FLOP_PER = 2 * M**3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=32)
    args = ap.parse_args()
    N = args.n

    w = jax.random.normal(jax.random.key(0), (M, M), jnp.bfloat16) * 0.01
    x0 = jax.random.normal(jax.random.key(1), (M, M), jnp.bfloat16)

    @jax.jit
    def step(x):
        y = x @ w
        # renormalize so the chain neither explodes nor collapses to a
        # constant XLA could exploit
        return y / (jnp.max(jnp.abs(y)) + 1e-3)

    def scan_n(n):
        @jax.jit
        def f(x):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out.sum()
        return f

    # warm everything
    jax.block_until_ready(step(x0))
    f_small = scan_n(N // 2)
    f_big = scan_n(N)
    float(f_small(x0))
    float(f_big(x0))

    def med(fn, trials=5):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    # A: per-call, block on last only
    def pat_a():
        x = x0
        for _ in range(N):
            x = step(x)
        jax.block_until_ready(x)
    t_a = med(pat_a) / N

    # B: per-call, scalar fetch at end
    def pat_b():
        x = x0
        for _ in range(N):
            x = step(x)
        float(x.sum())
    t_b = med(pat_b) / N

    # C: in-jit scan, block
    def pat_c():
        jax.block_until_ready(f_big(x0))
    t_c = med(pat_c) / N

    # D: in-jit scan, fetch
    def pat_d():
        float(f_big(x0))
    t_d = med(pat_d) / N

    # E: slope between N and N/2 (fetch-forced)
    def slope():
        t_big = med(lambda: float(f_big(x0)))
        t_small = med(lambda: float(f_small(x0)))
        return (t_big - t_small) / (N - N // 2)
    t_e = slope()

    for name, t in [('A per-call block-last', t_a), ('B per-call fetch-end', t_b),
                    ('C in-jit scan block', t_c), ('D in-jit scan fetch', t_d),
                    ('E in-jit scan slope', t_e)]:
        print(f'{name}: {t*1e3:7.3f} ms/matmul -> {FLOP_PER/t/1e12:8.1f} TFLOP/s',
              flush=True)


if __name__ == '__main__':
    main()
