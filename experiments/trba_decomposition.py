#!/usr/bin/env python
"""TRBA stage timings on the real chip (batch 256, bf16).

Stages: TPS rectification -> 32-layer FAN ResNet -> 2x BiLSTM ->
attention-LSTM greedy decode (26 sequential steps).
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from parseq_tpu.models import trba
from parseq_tpu.ops import rnn
from parseq_tpu.ops.layers import linear


def timed(fwd, make_stack, trials=5, n_disp=6):
    _ = float(fwd(make_stack(999)).sum())
    times = []
    for t in range(trials):
        stacks = [make_stack(1000 * t + i) for i in range(n_disp)]
        _ = float(jnp.stack([s.sum() for s in stacks]).sum())
        t0 = time.perf_counter()
        outs = [fwd(s) for s in stacks]
        _ = float(jnp.stack([o.sum() for o in outs]).sum())
        times.append((time.perf_counter() - t0) / n_disp)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--macro', type=int, default=2)
    args = ap.parse_args()
    B, M = args.batch, args.macro

    cfg = trba.TRBAConfig(num_tokens=97)
    params, stats = trba.init(jax.random.key(0), cfg)
    constants = trba.tps_constants(cfg)

    def make_stack(seed):
        return jax.random.uniform(jax.random.key(seed),
                                  (M, B, *cfg.img_size, 3), jnp.float32)

    def s_tps(x):
        return trba.tps(params['loc'], stats['loc'], cfg, x.astype(jnp.bfloat16),
                        constants, train=False)[0]

    def s_resnet(x):
        return trba.resnet(params['resnet'], stats['resnet'], s_tps(x), train=False)[0]

    def s_rnn(x):
        h = jnp.mean(s_resnet(x), axis=1)
        return rnn.bilstm(params['rnn1'], rnn.bilstm(params['rnn0'], h))

    def s_full(x):
        return trba.forward(params, stats, cfg, x, dtype=jnp.bfloat16,
                            constants=constants)[0]

    res = {}
    for name, fn in [('tps', s_tps), ('tps+resnet', s_resnet),
                     ('tps+resnet+bilstm', s_rnn), ('full (.. + attn decode)', s_full)]:
        fwd = jax.jit(lambda s, fn=fn: jax.lax.map(fn, s))
        t = timed(fwd, make_stack) / M
        res[name] = t
        print(f'{name:24s}: {t * 1e3:7.2f} ms/batch ({B / t:7.0f} img/s)')
    ks = list(res)
    for a, b in zip(ks, ks[1:]):
        print(f'  delta {b:24s}: {1e3 * (res[b] - res[a]):6.2f} ms')


if __name__ == '__main__':
    main()
