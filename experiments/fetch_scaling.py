#!/usr/bin/env python
"""Device->host fetch cost vs payload size (VERDICT r3 item 7).

Serving throughput through the axon relay is bounded by result-fetch round
trips; PERF.md projects ~11k img/s on a directly-attached TPU from a sub-ms
D2H assumption. This measures fetch time across payload sizes and fits
t = RTT0 + bytes/BW, separating the fixed relay round trip from the
bandwidth term. The bandwidth term is what survives on direct attach; the
projection stands or falls with it.

Also reports dispatch-only cost (enqueue without fetch) for the same sizes.
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=9)
    args = ap.parse_args()

    sizes = [1 << k for k in range(10, 27, 2)]  # 1 KB .. 64 MB
    import functools
    make = jax.jit(lambda key, n: jax.random.bits(key, (n,), jnp.uint8),
                   static_argnums=1)

    rows = []
    for n in sizes:
        # fresh device array each rep so the relay cannot reuse a cached reply
        arrs = [make(jax.random.key(i), n) for i in range(args.reps)]
        jax.block_until_ready(arrs)
        times = []
        for a in arrs:
            t0 = time.perf_counter()
            _ = np.asarray(a)  # device -> host fetch
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        rows.append((n, med))
        print(f'{n:>10d} B  fetch {med*1e3:8.2f} ms  ({n/med/1e6:8.1f} MB/s)',
              flush=True)

    # least-squares fit t = a + b * bytes over the measured range
    ns = np.asarray([r[0] for r in rows], np.float64)
    ts = np.asarray([r[1] for r in rows], np.float64)
    A = np.stack([np.ones_like(ns), ns], axis=1)
    (a, b), *_ = np.linalg.lstsq(A, ts, rcond=None)
    print(json.dumps({
        'rtt0_ms': round(a * 1e3, 3),
        'bandwidth_MBps': round(1e-6 / b, 1) if b > 0 else None,
        'fetch_256batch_ids_ms': round((a + b * 256 * 26 * 8) * 1e3, 3),
    }))


if __name__ == '__main__':
    main()
