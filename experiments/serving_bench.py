#!/usr/bin/env python
"""Online-serving benchmark: PARSeq-S behind the batching InferenceServer.

Open-loop load: one pacer thread submits requests at a fixed offered rate
without waiting for results; measures end-to-end latency (submit -> decoded text) p50/p95/p99
and sustained throughput. Exercises the full serving path: coalescing,
padding ladder, async dispatch, pipelined host decode.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from parseq_tpu.serve import InferenceServer
from parseq_tpu.utils.registry import create_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rate', type=float, default=2000.0, help='offered req/s')
    ap.add_argument('--seconds', type=float, default=10.0)
    ap.add_argument('--max_batch', type=int, default=64)
    ap.add_argument('--max_wait_ms', type=float, default=2.0)
    ap.add_argument('--pipeline_depth', type=int, default=16,
                    help='in-flight batches; the axon relay RTT (~0.1-0.5 s '
                         'under load) must be hidden by depth x batch')
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

    # True open loop: one pacer thread submits at the offered rate without
    # waiting; completions are resolved afterwards from the futures.
    pending = []
    stop = time.monotonic() + args.seconds
    interval = 1.0 / args.rate

    lat = []  # appended from the server's drain thread at completion time

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
        print('no requests completed (rate/window too low?)')
        srv.stop()
        return
    print(f'offered {args.rate:.0f} req/s for {args.seconds:.0f}s -> '
          f'completed {n} ({n / wall:.0f} req/s)')
    print(f'latency ms: p50={lat_ms[n // 2]:.1f} '
          f'p95={lat_ms[int(n * 0.95)]:.1f} p99={lat_ms[int(n * 0.99)]:.1f}')
    print(f'batches={srv.stats["batches"]} avg_fill='
          f'{srv.stats["requests"] / max(srv.stats["batches"], 1):.1f} '
          f'pad_waste={srv.stats["padded"] / max(srv.stats["requests"] + srv.stats["padded"], 1):.1%}')
    srv.stop()


if __name__ == '__main__':
    main()
