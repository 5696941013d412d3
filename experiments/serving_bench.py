#!/usr/bin/env python
"""Online-serving benchmark: PARSeq-S behind the batching InferenceServer.

Open-loop load: one pacer thread submits requests at a fixed offered rate
without waiting for results; measures end-to-end latency
(submit -> decoded text) p50/p95/p99 and sustained throughput. Exercises
the full serving path: coalescing, padding ladder, async dispatch,
pipelined host decode.

``--sweep`` (VERDICT r3 item 7) runs a ladder of offered rates against ONE
warm server and prints a latency-vs-offered-load table, alongside a
measured relay-RTT floor (tiny device->host fetch) so the relay term can
be separated from device+queue time: on this harness every completed
batch pays one relay round trip, so p50 at low load ~= RTT floor +
device compute + max_wait; the excess over that is queueing.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from parseq_tpu.serve import InferenceServer
from parseq_tpu.utils.registry import create_model


def relay_rtt_floor(n=20):
    """Median round trip of a minimal device->host fetch (1 f32 scalar)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x) * 1e-9)
    x = jnp.ones((8,), jnp.float32)
    float(f(x))  # compile
    ts = []
    for _ in range(n):
        t0 = time.monotonic()
        float(f(x))
        ts.append(time.monotonic() - t0)
    return sorted(ts)[n // 2] * 1e3


def run_rate(srv, imgs, rate, seconds):
    """Open-loop run at one offered rate. Returns a stats dict."""
    pending = []
    stop = time.monotonic() + seconds
    interval = 1.0 / rate
    lat = []  # appended from the server's drain thread at completion time

    stats0 = dict(srv.stats)
    t_start = time.monotonic()
    nxt = t_start
    i = 0
    while time.monotonic() < stop:
        now = time.monotonic()
        if now < nxt:
            time.sleep(min(nxt - now, 0.002))
            continue
        nxt += interval
        t0 = time.monotonic()
        f = srv.submit(imgs[i % len(imgs)])
        f.add_done_callback(lambda _f, t0=t0: lat.append(time.monotonic() - t0))
        pending.append(f)
        i += 1

    for f in pending:
        f.result(timeout=120)
    wall = time.monotonic() - t_start

    lat_ms = sorted(x * 1e3 for x in lat)
    n = len(lat_ms)
    if n == 0:
        return None
    batches = srv.stats['batches'] - stats0['batches']
    requests = srv.stats['requests'] - stats0['requests']
    padded = srv.stats['padded'] - stats0['padded']
    return {
        'offered': rate, 'completed': n, 'achieved': n / wall,
        'p50': lat_ms[n // 2], 'p95': lat_ms[int(n * 0.95)],
        'p99': lat_ms[min(int(n * 0.99), n - 1)],
        'batches': batches,
        'fill': requests / max(batches, 1),
        'pad_waste': padded / max(requests + padded, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rate', type=float, default=2000.0, help='offered req/s')
    ap.add_argument('--seconds', type=float, default=10.0)
    ap.add_argument('--max_batch', type=int, default=64)
    ap.add_argument('--max_wait_ms', type=float, default=2.0)
    ap.add_argument('--pipeline_depth', type=int, default=16,
                    help='in-flight batches; the axon relay RTT (~0.1-0.5 s '
                         'under load) must be hidden by depth x batch')
    ap.add_argument('--sweep', action='store_true',
                    help='latency-vs-offered-load table over a rate ladder')
    ap.add_argument('--rates', type=float, nargs='*',
                    default=[50, 200, 500, 1000, 2000, 4000])
    args = ap.parse_args()

    bundle = create_model('parseq')
    srv = InferenceServer(bundle, max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms,
                          pipeline_depth=args.pipeline_depth).start()
    print('warmup...', flush=True)
    srv.warmup()

    rng = np.random.default_rng(0)
    # uint8 request transport (round 3): 12 KB/img through the relay vs 49 KB
    imgs = [rng.integers(0, 256, (32, 128, 3), dtype=np.uint8) for _ in range(64)]

    if args.sweep:
        rtt = relay_rtt_floor()
        print(f'relay RTT floor (1-scalar fetch, median of 20): {rtt:.1f} ms')
        print(f'{"offered":>8} {"achieved":>9} {"p50":>8} {"p95":>8} '
              f'{"p99":>8} {"fill":>6} {"waste":>6}')
        for rate in args.rates:
            r = run_rate(srv, imgs, rate, args.seconds)
            if r is None:
                print(f'{rate:8.0f}  no completions')
                continue
            print(f'{r["offered"]:8.0f} {r["achieved"]:9.0f} {r["p50"]:8.1f} '
                  f'{r["p95"]:8.1f} {r["p99"]:8.1f} {r["fill"]:6.1f} '
                  f'{r["pad_waste"]:6.1%}', flush=True)
        srv.stop()
        return

    r = run_rate(srv, imgs, args.rate, args.seconds)
    if r is None:
        print('no requests completed (rate/window too low?)')
        srv.stop()
        return
    print(f'offered {args.rate:.0f} req/s for {args.seconds:.0f}s -> '
          f'completed {r["completed"]} ({r["achieved"]:.0f} req/s)')
    print(f'latency ms: p50={r["p50"]:.1f} p95={r["p95"]:.1f} p99={r["p99"]:.1f}')
    print(f'batches={r["batches"]} avg_fill={r["fill"]:.1f} '
          f'pad_waste={r["pad_waste"]:.1%}')
    srv.stop()


if __name__ == '__main__':
    main()
