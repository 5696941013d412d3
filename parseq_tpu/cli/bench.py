"""Model benchmarking CLI (reference bench.py equivalent).

Reports parameter count, static per-image FLOPs (utils/flops.py jaxpr
walk, fvcore MAC convention), and on-device latency
(median + IQR over timed runs, pipelined with distinct inputs). `--sweep`
sweeps max label length 1..25 step 4 like the reference's `+range=true`.

Usage:
    python -m parseq_tpu.cli.bench --model parseq [--batch_size 1] [--sweep]
"""

from __future__ import annotations

import argparse
import statistics
import time

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.ops.layers import count_params
from parseq_tpu.utils.registry import create_model


def time_forward(fwd, params, batches, trials=7):
    times = []
    for t in range(trials):
        t0 = time.perf_counter()
        outs = [fwd(params, b) for b in batches]
        _ = float(jnp.stack([o.sum() for o in outs]).sum())
        times.append((time.perf_counter() - t0) / len(batches))
    med = statistics.median(times)
    qs = statistics.quantiles(times, n=4)
    return med, qs[2] - qs[0]


def bench_model(name, batch_size=1, iters=8, trials=7, int8=False, **kwargs):
    model = create_model(name, **kwargs)
    if int8:
        from parseq_tpu.ops.quant import quantize_bundle

        model = quantize_bundle(model)
    fwd = jax.jit(model.forward_fn)

    h, w = model.img_size
    keys = jax.random.split(jax.random.key(0), iters + 1)
    batches = [jax.random.uniform(k, (batch_size, h, w, 3), jnp.float32) for k in keys]
    _ = float(jnp.stack([b.sum() for b in batches]).sum())

    # Static FLOPs by jaxpr walk (fvcore-convention MACs, comparable with
    # the reference README table). XLA's compiled cost_analysis undercounts
    # lax.scan bodies (costed once, not x trip-count) — see utils/flops.py.
    from parseq_tpu.utils.flops import count_flops

    cost_fwd = model.forward_fn
    if hasattr(model.cfg, 'decode_ar'):
        # parseq family: count the exact-scan AR path — the fused pallas
        # kernel is mathematically identical but opaque to tracing
        from parseq_tpu.models import parseq as _pq

        cfg = model.cfg
        cost_fwd = lambda p, x: _pq.forward(p, cfg, x, use_fused_ar=False)  # noqa: E731
    try:
        # Count with the pallas attention kernel gate forced off for the
        # same reason as the AR kernel above: pallas calls are opaque to
        # the jaxpr walk, which silently dropped ~0.36 G of attention MACs
        # per image at ViTSTR's L=197 when the L>=192 gate was introduced.
        from parseq_tpu.ops import attention as _attn

        with _attn.force_einsum():
            flops = count_flops(cost_fwd, model.params, batches[0]) / batch_size
    except Exception:  # noqa: BLE001 - flops are informational
        flops = float('nan')

    _ = float(fwd(model.params, batches[-1]).sum())  # warmup/compile
    med, iqr = time_forward(fwd, model.params, batches[:iters], trials)

    n_params = count_params(model.params)
    return {
        'model': model.name,
        'params_M': round(n_params / 1e6, 3),
        'flops_per_img_G': round(flops / 1e9, 3) if flops == flops else None,
        'batch_size': batch_size,
        'latency_ms_median': round(med * 1e3, 3),
        'latency_ms_iqr': round(iqr * 1e3, 3),
        'throughput_img_s': round(batch_size / med, 1),
    }


def _bench_defaults():
    """Composable defaults from configs/bench.yaml (reference configs/bench.yaml)."""
    from parseq_tpu.utils.config import CONFIG_ROOT, _load

    try:
        cfg = _load(CONFIG_ROOT / 'bench.yaml')
    except OSError:
        cfg = {}
    d = cfg.get('bench', {}) or {}
    d.setdefault('model', (cfg.get('defaults') or {}).get('model', 'parseq'))
    return d


def main(argv=None):
    d = _bench_defaults()
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default=d.get('model', 'parseq'))
    ap.add_argument('--batch_size', type=int, default=d.get('batch_size', 1))
    ap.add_argument('--iters', type=int, default=d.get('iters', 8))
    ap.add_argument('--trials', type=int, default=d.get('trials', 7))
    ap.add_argument('--sweep', action='store_true', default=bool(d.get('sweep', False)),
                    help='sweep label length 1..25 step 4')
    ap.add_argument('--int8', action='store_true',
                    help='int8 encoder serving path (ViT-backed models)')
    ap.add_argument('--profile', default=None, metavar='DIR',
                    help='capture a jax.profiler trace of the timed runs into DIR')
    args, unknown = ap.parse_known_args(argv)
    from parseq_tpu.utils.config import parse_model_args

    kwargs = parse_model_args(unknown)

    import json
    from contextlib import nullcontext

    trace = jax.profiler.trace(args.profile) if args.profile else nullcontext()
    with trace:
        _run_bench(args, kwargs)


def _run_bench(args, kwargs):
    import json

    if args.sweep:
        for L in range(1, 26, 4):
            r = bench_model(args.model, args.batch_size, args.iters, args.trials,
                            int8=args.int8, max_label_length=L, **kwargs)
            r['max_label_length'] = L
            print(json.dumps(r))
    else:
        print(json.dumps(bench_model(args.model, args.batch_size, args.iters,
                                     args.trials, int8=args.int8, **kwargs)))


if __name__ == '__main__':
    main()
